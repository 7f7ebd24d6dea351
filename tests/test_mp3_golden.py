"""MPEG audio (MP3/MP2/MP1) decoder goldens: the framework's from-scratch
decoder vs the reference's own vendored dr_mp3.

Pinning layers:
  1. reference golden — a spec-covering generated corpus (tools/mp3gen.py:
     MPEG-1/2/2.5 Layer III with every block type, all huffman table
     classes, linbits escapes, count1 A/B, scfsi, MS/intensity/dual/mono,
     LSF partitions, bit reservoir, CRC, padding, ID3; Layer II and Layer I
     with all allocation tables and grouped quantization) plus the
     reference's own samples/jfk.mp3, decoded by BOTH the framework decoder
     and the reference's vendored miniaudio/dr_mp3 (reference:
     examples/common-whisper.cpp:46 — the decode path every reference
     example uses), compiled unmodified.  The s16 outputs must agree within
     1 LSB everywhere and be >=90% exactly equal (the reference computes in
     f32 with a polynomial |x|^(4/3); this decoder computes in f64, so
     values that land on a rounding boundary may differ by one step).
  2. invalid window sequences (start->start etc.) reproduce the reference's
     deviation from the textbook overlap-add (see _imdct_bands' docstring)
     within 2 LSB.
  3. loader integration + robustness (ID3/garbage/truncation handling).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from whisper_tpu.audio.mp3 import Mp3Error, decode_mp3, is_mpeg_audio

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import mp3gen  # noqa: E402

from test_flac_golden import _build_harness  # noqa: E402  (shared oracle)

JFK_MP3 = "/root/reference/samples/jfk.mp3"


def _dr_mp3_decode(blob: bytes):
    exe = _build_harness()
    if exe is None:
        pytest.skip("reference miniaudio.h or C toolchain unavailable")
    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        r = subprocess.run([exe, path], capture_output=True, timeout=120)
    finally:
        os.unlink(path)
    assert r.returncode == 0, "reference dr_mp3 refused the stream"
    meta = dict(kv.split("=") for kv in r.stderr.decode().split())
    ch = int(meta["ch"])
    return (np.frombuffer(r.stdout, np.float32).reshape(-1, ch),
            int(meta["rate"]))


def _assert_matches(blob: bytes, max_lsb: int = 1, min_exact: float = 0.90):
    ref, ref_hz = _dr_mp3_decode(blob)
    mine, hz = decode_mp3(blob)
    assert hz == ref_hz
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    m16 = np.round(mine * 32768.0).astype(np.int64)
    o16 = np.round(ref.astype(np.float64) * 32768.0).astype(np.int64)
    d = np.abs(m16 - o16)
    assert d.max() <= max_lsb, f"max s16 diff {d.max()}"
    exact = float(np.mean(d == 0))
    assert exact >= min_exact, f"only {exact:.4f} exact"


@pytest.mark.parametrize("name", [c[0] for c in mp3gen.corpus()])
def test_generated_corpus_matches_reference(name):
    data = dict(mp3gen.corpus())[name]
    _assert_matches(data)


def test_jfk_mp3_matches_reference():
    """The reference's own sample: MPEG-2 LSF Layer III, 16 kHz mono."""
    if not os.path.exists(JFK_MP3):
        pytest.skip("reference samples unavailable")
    with open(JFK_MP3, "rb") as f:
        blob = f.read()
    _assert_matches(blob, min_exact=0.99)


def test_invalid_window_sequences_match_reference():
    """Non-conformant block-type transitions: the decoder deliberately
    reproduces the reference's consumption-windowed overlap behavior."""
    blob = mp3gen.gen_l3(
        seed=99, mpeg=1, sr_idx=0, bitrate_idx=11, mode=mp3gen.MODE_MONO,
        block_plan=[0, 1, 1, 2, 3, 3, 0, 2, 2, 3, 1, 2.5, 2.5, 0, 3, 2, 0, 1])
    _assert_matches(blob, max_lsb=2, min_exact=0.85)


def test_reservoir_and_leading_skip():
    """Frames whose main_data_begin exceeds the held reservoir produce no
    output (the stream starts mid-reservoir), exactly like the reference."""
    full = mp3gen.gen_l3(seed=7, mpeg=1, sr_idx=0, bitrate_idx=11,
                         mode=mp3gen.MODE_MONO, use_reservoir=True)
    # chop the first frame off: the next frame's lookback is unsatisfiable
    from whisper_tpu.audio.mp3 import _find_frame
    i, size, _ = _find_frame(full, 0)
    chopped = full[i + size:]
    ref, _ = _dr_mp3_decode(chopped)
    mine, _ = decode_mp3(chopped)
    assert mine.shape == ref.shape


def test_sniffing_and_robustness():
    data = mp3gen.gen_l3(seed=3, n_frames=4, mpeg=1, sr_idx=0, bitrate_idx=9,
                         mode=mp3gen.MODE_MONO)
    assert is_mpeg_audio(data)
    assert is_mpeg_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00junk")
    assert not is_mpeg_audio(b"RIFF....WAVEfmt ")
    assert not is_mpeg_audio(os.urandom(4096))
    with pytest.raises(Mp3Error):
        decode_mp3(b"")
    with pytest.raises(Mp3Error):
        decode_mp3(os.urandom(2048))
    # garbage prefix: sync scan must recover
    pcm0, hz0 = decode_mp3(data)
    pcm1, hz1 = decode_mp3(b"\x00\x12garbage" + data)
    assert hz0 == hz1 and pcm0.shape == pcm1.shape
    # truncation mid-frame: decodes the complete frames, no crash
    pcm2, _ = decode_mp3(data[:len(data) - 7])
    assert pcm2.shape[0] <= pcm0.shape[0]


def test_resync_near_eof_rejects_unverifiable_tail():
    """A sync candidate whose first follow-up header lies beyond the data
    is rejected (the reference's frame matcher requires at least one
    verified successor): garbage + one valid frame + 2 trailing bytes
    decodes NOTHING, in both the Python and native decoders."""
    from whisper_tpu.audio.native import decode_mp3_native

    frame = mp3gen.gen_l3(seed=11, n_frames=1, mpeg=1, sr_idx=0,
                          bitrate_idx=9, mode=mp3gen.MODE_MONO)
    blob = b"\x00\x31garbage.\x00" + frame + b"\xff\xfb"
    with pytest.raises(Mp3Error):
        decode_mp3(blob)
    nat_err = None
    try:
        nat = decode_mp3_native(blob)
    except ValueError as e:
        nat_err = e
        nat = None
    if nat is not None:
        pytest.fail("native decoder accepted an unverifiable tail frame")
    # a lone frame that IS the whole buffer stays decodable (the
    # single-frame special case, not the resync walk)
    pcm, hz = decode_mp3(frame)
    assert pcm.shape[0] == 1152 and hz == 44100
    assert nat_err is None or isinstance(nat_err, ValueError)


def test_native_matches_python_bitwise():
    """The C++ decoder (native/wtpu_mp3.cpp) is a port of the same
    double-precision pipeline: outputs must be bitwise identical."""
    from whisper_tpu.audio.native import decode_mp3_native

    blobs = [data for _, data in mp3gen.corpus()]
    if os.path.exists(JFK_MP3):
        with open(JFK_MP3, "rb") as f:
            blobs.append(f.read())
    ran = 0
    for blob in blobs:
        nat = decode_mp3_native(blob)
        if nat is None:
            pytest.skip("native audio library unavailable")
        py_pcm, py_hz = decode_mp3(blob)
        assert nat[1] == py_hz
        np.testing.assert_array_equal(nat[0], py_pcm)
        ran += 1
    assert ran == len(blobs)


def test_loader_integration(tmp_path):
    from whisper_tpu.audio.io import load_audio

    data = mp3gen.gen_l3(seed=5, n_frames=8, mpeg=2, sr_idx=2, bitrate_idx=8,
                         mode=mp3gen.MODE_MONO)  # 16 kHz mono
    p = tmp_path / "x.mp3"
    p.write_bytes(data)
    mono, st = load_audio(str(p))
    pcm, hz = decode_mp3(data)
    assert hz == 16000
    np.testing.assert_allclose(mono, pcm[:, 0], atol=0)
    # stereo request on a mono source duplicates channels
    mono2, st2 = load_audio(str(p), stereo=True)
    assert st2.shape == (mono.shape[0], 2)
    # extensionless path is sniffed
    p2 = tmp_path / "noext"
    p2.write_bytes(data)
    mono3, _ = load_audio(str(p2))
    np.testing.assert_allclose(mono3, mono, atol=0)

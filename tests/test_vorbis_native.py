"""Native (C++) Ogg Vorbis decoder goldens.

Three pinning layers, mirroring the FLAC/MP3 native test structure:
  1. native vs Python — the C++ port (native/wtpu_vorbis.cpp) must reproduce
     the pure-Python decoder (audio/vorbis.py) on the full generated corpus
     and on a real libvorbis file.  Both compute the IMDCT in f64 and all
     accumulation in f32 with identical operation order, so outputs are
     expected bit-identical; the assertion allows 1 s16 LSB for the FFT
     implementation difference (own radix-2 vs pocketfft, ~1e-15 relative).
  2. native vs the reference's stb_vorbis — same oracle and tolerance as the
     Python goldens (tests/test_vorbis_golden.py builds the reference's
     vendored stb_vorbis inside miniaudio, unmodified).
  3. behavioral parity on malformed streams — the native decoder must raise
     (ValueError) exactly where the Python decoder raises, and its probe
     must agree with is_ogg_vorbis, so loader routing is decoder-agnostic.
"""

import ctypes
import os
import sys

import numpy as np
import pytest

from whisper_tpu.audio.native import _load, decode_ogg_vorbis_native
from whisper_tpu.audio.vorbis import decode_ogg_vorbis, is_ogg_vorbis

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import vorbisgen  # noqa: E402

from test_vorbis_golden import _REAL_OGG, _ref_decode  # noqa: E402

_LIB = _load()
pytestmark = pytest.mark.skipif(
    _LIB is None or not getattr(_LIB, "_has_vorbis", False),
    reason="native audio library with vorbis support not built")

_CORPUS = dict(vorbisgen.corpus())


def _s16(x: np.ndarray) -> np.ndarray:
    return np.round(x.astype(np.float64) * 32768.0)


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_corpus_matches_python(name):
    blob = _CORPUS[name]
    py, py_rate = decode_ogg_vorbis(blob)
    nat, nat_rate = decode_ogg_vorbis_native(blob)
    assert nat_rate == py_rate
    assert nat.shape == py.shape, (nat.shape, py.shape)
    if py.size == 0:
        return
    d = np.abs(_s16(py) - _s16(nat))
    assert d.max() <= 1, f"max s16 diff {d.max()}"
    assert float(np.mean(d == 0)) >= 0.995
    assert np.abs(py - nat).max() <= 1e-6 * max(1.0, np.abs(py).max())


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_corpus_matches_reference(name):
    """Same oracle + tolerance as the Python decoder's golden suite."""
    blob = _CORPUS[name]
    ref, ref_rate = _ref_decode(blob)
    nat, rate = decode_ogg_vorbis_native(blob)
    assert rate == ref_rate
    assert nat.shape == ref.shape, (nat.shape, ref.shape)
    if ref.size == 0:
        return
    d = np.abs(_s16(nat) - _s16(ref))
    assert d.max() <= 2, f"max s16 diff {d.max()}"
    assert float(np.mean(d == 0)) >= 0.95


def test_real_libvorbis_file_matches_python():
    if not os.path.exists(_REAL_OGG):
        pytest.skip("no real-world ogg sample in this image")
    blob = open(_REAL_OGG, "rb").read()
    py, py_rate = decode_ogg_vorbis(blob)
    nat, nat_rate = decode_ogg_vorbis_native(blob)
    assert nat_rate == py_rate and nat.shape == py.shape
    d = np.abs(_s16(py) - _s16(nat))
    assert d.max() <= 1
    assert float(np.mean(d == 0)) >= 0.999


def _short_id_header_stream() -> bytes:
    """One BOS page whose ID packet is 29 bytes: every field present, the
    framing bit missing.  parse_header's final read1() hits end-of-packet,
    which must surface as VorbisError (ValueError), not the internal
    _EndOfPacket — the native decoder returns rc=1 for the same bytes."""
    from whisper_tpu.audio.ogg import pack_pages
    bw = vorbisgen.BitWriter()
    bw.write(0, 32)                       # version
    bw.write(1, 8)                        # channels
    bw.write(8000, 32)                    # rate
    bw.write(0, 32), bw.write(0, 32), bw.write(0, 32)
    bw.write(8, 4), bw.write(11, 4)       # blocksizes 256/2048; no framing bit
    pkt = b"\x01vorbis" + bw.to_bytes()
    assert len(pkt) == 29
    return pack_pages([(pkt, 0)], flush_after=(0,))


def _huge_codebook_stream() -> bytes:
    """Valid ID+comment headers, then a setup header declaring one codebook
    with entries=2^24-1, dims=4 — a 256 MB VQ table plus a 16M-entry huffman
    map from ~50 input bytes.  Both decoders must refuse at the shared size
    cap without allocating."""
    from whisper_tpu.audio.ogg import pack_pages
    s = vorbisgen.Setup(channels=1, rate=8000, bs0=256, bs1=2048, books=[],
                        floors=[], residues=[], mappings=[], modes=[])
    bw = vorbisgen.BitWriter()
    bw.write(0, 8)                        # codebook_count - 1
    bw.write(0x564342, 24)                # 'BCV' sync
    bw.write(4, 16)                       # dims
    bw.write((1 << 24) - 1, 24)           # entries
    bw.write(1, 1)                        # ordered
    bw.write(7, 5)                        # initial codeword length 8
    bw.write((1 << 24) - 1, 24)           # one count field covers all entries
    pkt = b"\x05vorbis" + bw.to_bytes()
    return pack_pages([(s.id_packet(), 0), (s.comment_packet(), 0), (pkt, 0)])


def _adversarial_cases():
    blob = _CORPUS["stereo_coupled"]
    second_page = blob.find(b"OggS", 4)
    return {
        "empty": b"",
        "short_id_header": _short_id_header_stream(),
        "huge_codebook": _huge_codebook_stream(),
        "garbage": b"\x00" * 64,
        "not_ogg": b"RIFF" + b"\x00" * 100,
        "trunc_header_page": blob[:20],
        "trunc_mid": blob[: len(blob) // 2],
        "trunc_late": blob[:-7],
        "bad_version": blob[:4] + b"\x01" + blob[5:],
        "flip_setup_byte": blob[:200] + bytes([blob[200] ^ 0xFF]) + blob[201:],
        "only_first_page": blob[:second_page],
        "trailing_garbage": blob + b"ID3 tail not a page",
        "full": blob,
    }


@pytest.mark.parametrize("case", sorted(_adversarial_cases()))
def test_error_parity_with_python(case):
    """Native must succeed/raise exactly where the Python decoder does."""
    data = _adversarial_cases()[case]
    try:
        py = decode_ogg_vorbis(data)
        py_raised = None
    except ValueError as e:  # the decoder's whole error surface (VorbisError)
        py, py_raised = None, type(e).__name__
    try:
        nat = decode_ogg_vorbis_native(data)
        nat_raised = None
    except ValueError as e:
        nat, nat_raised = None, type(e).__name__
    assert (py_raised is None) == (nat_raised is None), \
        f"py={py_raised} native={nat_raised}"
    if py_raised is None:
        assert nat[0].shape == py[0].shape and nat[1] == py[1]
        if py[0].size:
            assert np.abs(_s16(py[0]) - _s16(nat[0])).max() <= 1


@pytest.mark.parametrize("case", sorted(_adversarial_cases()))
def test_probe_parity(case):
    data = _adversarial_cases()[case]
    buf = np.frombuffer(data + b"\x00", dtype=np.uint8)  # non-null ptr
    nat = bool(_LIB.wtpu_vorbis_probe(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data)))
    assert nat == is_ogg_vorbis(data)


def test_loader_uses_native_path(tmp_path, monkeypatch):
    """load_vorbis must route through the native decoder when available."""
    import whisper_tpu.audio.io as aio
    import whisper_tpu.audio.vorbis as pv

    p = tmp_path / "x.ogg"
    p.write_bytes(_CORPUS["mono_short"])
    calls = {"py": 0}

    def boom(raw):
        calls["py"] += 1
        raise AssertionError("python fallback should not run")

    monkeypatch.setattr(pv, "decode_ogg_vorbis", boom)
    mono, stereo = aio.load_vorbis(str(p))
    assert calls["py"] == 0 and mono.ndim == 1 and mono.size > 0

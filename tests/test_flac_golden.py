"""FLAC decoder goldens: the framework's from-scratch decoders vs the
reference's own vendored dr_flac.

Three layers of pinning:
  1. lossless round-trip — tools/flacgen (our spec-covering encoder)
     through the pure-Python decoder recovers the input samples exactly;
  2. native == Python — the C++ decoder (native/wtpu_flac.cpp) returns
     the identical int32 array, rate, and bit depth;
  3. reference golden — the SAME bytes through the reference's vendored
     miniaudio/dr_flac (reference: examples/common-whisper.cpp:27,46 is
     the decode path every reference example uses), compiled unmodified
     from /root/reference/examples/miniaudio.h, produce BIT-IDENTICAL f32
     output to ours (audio.flac.pcm_to_f32 mirrors dr_flac's
     shift-then-/2^31 conversion, examples/miniaudio.h:82143).

The case matrix covers every subframe type (CONSTANT/VERBATIM/FIXED/LPC),
all stereo decorrelation modes, both Rice methods, escape partitions,
partition orders, wasted bits, 8/16/24-bit, and both blocking strategies.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from whisper_tpu.audio.flac import FlacError, decode_flac, is_flac, pcm_to_f32
from whisper_tpu.audio.native import decode_flac_native

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.flacgen import encode_flac  # noqa: E402

_HARNESS_SRC = r"""
#define MINIAUDIO_IMPLEMENTATION
#define MA_NO_DEVICE_IO
#define MA_NO_GENERATION
#include "miniaudio.h"
#include <stdio.h>
int main(int argc, char** argv) {
    ma_decoder_config cfg = ma_decoder_config_init(ma_format_f32, 0, 0);
    ma_decoder dec;
    if (argc < 2 || ma_decoder_init_file(argv[1], &cfg, &dec) != MA_SUCCESS)
        return 1;
    fprintf(stderr, "ch=%u rate=%u\n", dec.outputChannels,
            dec.outputSampleRate);
    float buf[4096];
    for (;;) {
        ma_uint64 got = 0;
        ma_decoder_read_pcm_frames(&dec, buf, 4096 / dec.outputChannels,
                                   &got);
        if (got == 0) break;
        fwrite(buf, sizeof(float), (size_t)(got * dec.outputChannels),
               stdout);
    }
    ma_decoder_uninit(&dec);
    return 0;
}
"""

_HARNESS_EXE = "/tmp/wtpu_madecode/madecode"


def _build_harness():
    """Compile the reference's miniaudio into a decode-to-stdout tool
    (cached in /tmp); None when the reference tree or toolchain is absent."""
    if os.path.exists(_HARNESS_EXE):
        return _HARNESS_EXE
    ma = "/root/reference/examples/miniaudio.h"
    if not os.path.exists(ma):
        return None
    os.makedirs(os.path.dirname(_HARNESS_EXE), exist_ok=True)
    src = os.path.join(os.path.dirname(_HARNESS_EXE), "harness.c")
    with open(src, "w") as f:
        f.write(_HARNESS_SRC)
    try:
        subprocess.run(
            ["gcc", "-O2", "-I", os.path.dirname(ma), src,
             "-o", _HARNESS_EXE, "-lm", "-lpthread", "-ldl"],
            check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return None
    return _HARNESS_EXE if os.path.exists(_HARNESS_EXE) else None


def _dr_flac_decode(blob: bytes):
    exe = _build_harness()
    if exe is None:
        pytest.skip("reference miniaudio.h or C toolchain unavailable")
    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        r = subprocess.run([exe, path], capture_output=True, timeout=120)
    finally:
        os.unlink(path)
    assert r.returncode == 0, "reference dr_flac refused the stream"
    meta = dict(kv.split("=") for kv in r.stderr.decode().split())
    ch = int(meta["ch"])
    return (np.frombuffer(r.stdout, np.float32).reshape(-1, ch),
            int(meta["rate"]))


# name -> (encoder kwargs, channels, n_samples, sample-gen flags)
CASES = {
    "mono16":    (dict(bits=16), 1, 5000, {}),
    "stereo_indep": (dict(bits=16, stereo_mode="independent"), 2, 4096, {}),
    "stereo_left_side": (dict(bits=16, stereo_mode="left_side"), 2, 4096, {}),
    "stereo_right_side": (dict(bits=16, stereo_mode="right_side"), 2, 4096, {}),
    "stereo_mid_side": (dict(bits=16, stereo_mode="mid_side"), 2, 4097, {}),
    "mono8":     (dict(bits=8, block_size=256), 1, 3000, {}),
    "stereo24":  (dict(bits=24, stereo_mode="mid_side"), 2, 3000, {}),
    "verbatim":  (dict(bits=16, subframe_kind="verbatim", block_size=256),
                  1, 1024, {}),
    "constant":  (dict(bits=16, subframe_kind="constant", block_size=256),
                  1, 1024, {"constant": True}),
    "rice2_parts": (dict(bits=16, rice_method=1, part_order=3,
                         block_size=512), 1, 2048, {}),
    "escape":    (dict(bits=16, subframe_kind="fixed0", escape_raw_bits=17,
                       block_size=256), 1, 1024, {}),
    "escape_zero": (dict(bits=16, subframe_kind="fixed0", escape_raw_bits=0,
                         block_size=256), 1, 512, {"zeros": True}),
    "wasted_bits": (dict(bits=16, use_wasted=True), 1, 2048,
                    {"wasted": True}),
    "lpc":       (dict(bits=16, subframe_kind="lpc",
                       lpc_coef=[1024, -512, 256], lpc_shift=10), 1, 2000, {}),
    "lpc_order8": (dict(bits=16, subframe_kind="lpc",
                        lpc_coef=[700, -300, 150, -80, 40, -20, 10, -5],
                        lpc_shift=9, lpc_precision=11), 1, 2000, {}),
    "variable_blocking": (dict(bits=16, variable_blocking=True,
                               block_size=192), 1, 700, {}),
    "sr_coded":  (dict(bits=16, sr_code_mode="coded", block_size=576),
                  2, 2048, {}),
    "sr_hz16":   (dict(bits=16, sr_code_mode="hz16", block_size=250),
                  1, 999, {}),
    "bps_streaminfo": (dict(bits=16, bps_from_streaminfo=True), 1, 1500, {}),
    "short_tail": (dict(bits=16, block_size=4096), 1, 4100, {}),
}


def _gen(name, rng=None):
    kw, ch, n, flags = CASES[name]
    bits = kw.get("bits", 16)
    lim = 1 << (bits - 1)
    rng = rng or np.random.RandomState(hash(name) % (2 ** 31))
    if flags.get("constant"):
        x = np.full((n, ch), 99, np.int64)
    elif flags.get("zeros"):
        x = np.zeros((n, ch), np.int64)
    else:
        x = (rng.randn(n, ch) * lim * 0.05).astype(np.int64).clip(
            -lim, lim - 1)
        if flags.get("wasted"):
            x = (x >> 3) << 3
        if kw.get("escape_raw_bits"):
            x = x.clip(-(1 << 15), (1 << 15) - 1)
    return x, encode_flac(x, 16000, **kw), bits


@pytest.mark.parametrize("name", list(CASES))
def test_roundtrip_and_native_parity(name):
    x, blob, bits = _gen(name)
    assert is_flac(blob)
    pcm, sr, b = decode_flac(blob)
    assert sr == 16000 and b == bits
    assert pcm.shape == x.shape
    assert (pcm.astype(np.int64) == x).all(), "lossless round-trip broke"

    nat = decode_flac_native(blob)
    if nat is None:
        pytest.skip("native audio library not built")
    npcm, nsr, nb = nat
    assert (npcm == pcm).all() and nsr == sr and nb == b


@pytest.mark.parametrize("name", list(CASES))
def test_bit_exact_vs_reference_dr_flac(name):
    _, blob, bits = _gen(name)
    golden, grate = _dr_flac_decode(blob)
    pcm, sr, b = decode_flac(blob)
    ours = pcm_to_f32(pcm, b)
    assert grate == sr
    assert golden.shape == ours.shape
    assert (golden.view(np.uint32) == ours.view(np.uint32)).all(), \
        "f32 output differs from the reference's vendored dr_flac"


def test_load_audio_flac_end_to_end(tmp_path):
    """load_audio on a .flac: stereo downmix + mono/stereo forms match the
    wav path's semantics, resample engages for non-16k rates."""
    from whisper_tpu.audio.io import load_audio

    rng = np.random.RandomState(3)
    x = (rng.randn(8000, 2) * 3000).astype(np.int64).clip(-32768, 32767)
    p = tmp_path / "a.flac"
    p.write_bytes(encode_flac(x, 16000, bits=16, stereo_mode="mid_side"))
    mono, st = load_audio(str(p), stereo=True)
    f32 = pcm_to_f32(x.astype(np.int32), 16)
    np.testing.assert_allclose(mono, f32.mean(axis=1), atol=1e-7)
    assert st.shape == (8000, 2)
    np.testing.assert_array_equal(st, f32)

    # resample path: 8 kHz stream comes back at 16 kHz length
    p2 = tmp_path / "b.flac"
    p2.write_bytes(encode_flac(x[:4000, :1], 8000, bits=16))
    mono2, _ = load_audio(str(p2))
    assert len(mono2) == 8000

    # extension-free sniffing: FLAC bytes under a .wav name still decode
    p3 = tmp_path / "c.wav"
    p3.write_bytes(encode_flac(x[:1000], 16000, bits=16))
    mono3, _ = load_audio(str(p3))
    assert len(mono3) == 1000


def test_malformed_streams_rejected():
    x = (np.arange(2048) % 251 - 125).astype(np.int64)[:, None]
    blob = bytearray(encode_flac(x, 16000, bits=16, block_size=512))

    with pytest.raises(FlacError):
        decode_flac(b"RIFF" + bytes(blob[4:]))

    corrupt = bytearray(blob)
    corrupt[len(corrupt) // 2] ^= 0xFF   # flip bits inside a frame
    with pytest.raises(FlacError):
        decode_flac(bytes(corrupt))
    with pytest.raises(ValueError):
        if decode_flac_native(bytes(corrupt)) is None:
            raise ValueError("native unavailable")  # same outcome either way

    with pytest.raises(FlacError):
        decode_flac(bytes(blob[: len(blob) // 2]))  # truncated mid-frame

"""Resampling goldens: the framework's miniaudio-equivalent resampler vs
the reference's actual load path.

The reference loads EVERY audio file through a decoder configured for
16 kHz output (reference: examples/common-whisper.cpp:52), so non-16 kHz
sources pass through the vendored miniaudio linear resampler (order-4
Butterworth low-pass + fixed-point lerp).  The framework previously used
plain un-filtered linear interpolation — audibly different (aliasing) and
transcript-divergent on 44.1/48 kHz sources.  audio/resample.py now
mirrors the reference pipeline in f32; this suite pins it against the
reference's own decoder compiled with a forced 16 kHz output, across
up/downsampling, mono/stereo, wav and mp3 containers, and the common real
rates.
"""

import os
import struct
import subprocess
import sys
import tempfile
import wave

import numpy as np
import pytest

from whisper_tpu.audio.resample import resample_ma

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_HARNESS_SRC = r"""
#define MINIAUDIO_IMPLEMENTATION
#define MA_NO_DEVICE_IO
#define MA_NO_GENERATION
#include "miniaudio.h"
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
    /* argv: file [channels rate] — forced-format decode like read_audio_data */
    ma_uint32 ch = argc > 2 ? (ma_uint32)atoi(argv[2]) : 0;
    ma_uint32 rate = argc > 3 ? (ma_uint32)atoi(argv[3]) : 0;
    ma_decoder_config cfg = ma_decoder_config_init(ma_format_f32, ch, rate);
    ma_decoder dec;
    if (argc < 2 || ma_decoder_init_file(argv[1], &cfg, &dec) != MA_SUCCESS)
        return 1;
    fprintf(stderr, "ch=%u rate=%u\n", dec.outputChannels, dec.outputSampleRate);
    float buf[4096];
    for (;;) {
        ma_uint64 got = 0;
        ma_decoder_read_pcm_frames(&dec, buf, 4096 / dec.outputChannels, &got);
        if (got == 0) break;
        fwrite(buf, sizeof(float), (size_t)(got * dec.outputChannels), stdout);
    }
    ma_decoder_uninit(&dec);
    return 0;
}
"""

_EXE = "/tmp/wtpu_madecode/madecode_fmt"


def _build():
    if os.path.exists(_EXE):
        return _EXE
    ma = "/root/reference/examples/miniaudio.h"
    if not os.path.exists(ma):
        return None
    os.makedirs(os.path.dirname(_EXE), exist_ok=True)
    src = _EXE + ".c"
    with open(src, "w") as f:
        f.write(_HARNESS_SRC)
    try:
        subprocess.run(["gcc", "-O2", "-I", os.path.dirname(ma), src, "-o",
                        _EXE, "-lm", "-lpthread", "-ldl"],
                       check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return None
    return _EXE if os.path.exists(_EXE) else None


def _oracle(path, channels, rate):
    exe = _build()
    if exe is None:
        pytest.skip("reference miniaudio.h or C toolchain unavailable")
    r = subprocess.run([exe, path, str(channels), str(rate)],
                       capture_output=True, timeout=120)
    assert r.returncode == 0
    return np.frombuffer(r.stdout, np.float32).reshape(-1, channels)


def _write_wav(path, pcm16, sr, ch):
    with wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.astype("<i2").tobytes())


def _rand_pcm(seed, n, ch):
    rng = np.random.RandomState(seed)
    # band-limited-ish noise so both near-DC and high frequencies exist
    x = rng.randn(n + 64, ch)
    x = np.cumsum(x, axis=0)[64:]
    x -= x.mean(axis=0)
    x = x / np.abs(x).max() * 0.7
    return np.round(x * 32767.0).astype(np.int16)


RATES = [(44100, 1), (48000, 1), (22050, 2), (32000, 2), (8000, 1),
         (11025, 1), (24000, 2)]


@pytest.mark.parametrize("sr,ch", RATES)
def test_wav_resample_matches_reference(sr, ch, tmp_path):
    pcm16 = _rand_pcm(sr, sr // 2, ch)   # 0.5 s
    p = str(tmp_path / "x.wav")
    _write_wav(p, pcm16, sr, ch)
    ref = _oracle(p, ch, 16000)
    x = (pcm16.astype(np.float32) / 32768.0)
    mine = resample_ma(x, sr, 16000)
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    d = np.abs(mine - ref)
    # f32-for-f32 replication.  scipy's DF2T biquad sums in a slightly
    # different order than the reference's, so outputs can differ in the
    # last float bits (~2e-6 = a tenth of an s16 step); integer rate
    # ratios (a1 == 0) come out bitwise identical.
    assert d.max() <= 2e-6, d.max()
    if sr in (32000, 8000):
        assert float(np.mean(mine == ref)) > 0.95


def test_stereo_to_mono_then_resample_matches_reference(tmp_path):
    """read_audio_data's mono path: channel downmix happens BEFORE the
    resampler (channels-first execution path when ch_in >= ch_out)."""
    pcm16 = _rand_pcm(7, 44100 // 2, 2)
    p = str(tmp_path / "x.wav")
    _write_wav(p, pcm16, 44100, 2)
    ref = _oracle(p, 1, 16000)
    x = pcm16.astype(np.float32) / 32768.0
    mono = (x[:, 0] + x[:, 1]) * np.float32(0.5)
    mine = resample_ma(mono, 44100, 16000)
    assert mine.shape[0] == ref.shape[0]
    assert np.abs(mine - ref[:, 0]).max() <= 2e-6


def test_loader_uses_ma_resampler(tmp_path):
    from whisper_tpu.audio.io import load_audio

    pcm16 = _rand_pcm(3, 44100, 1)
    p = str(tmp_path / "x.wav")
    _write_wav(p, pcm16, 44100, 1)
    ref = _oracle(p, 1, 16000)
    mono, _ = load_audio(str(p))
    assert mono.shape[0] == ref.shape[0]
    assert np.abs(mono - ref[:, 0]).max() <= 2e-6


def test_mp3_load_at_441_matches_reference_end_to_end(tmp_path):
    """A 44.1 kHz mp3 through the full load path vs the reference's full
    decode+resample path (both decoders agree within 1 s16 LSB, so the
    resampled outputs agree within ~the same scale)."""
    from tools.mp3gen import gen_l3
    from whisper_tpu.audio.io import load_audio

    data = gen_l3(seed=21, n_frames=20, mpeg=1, sr_idx=0, bitrate_idx=9,
                  mode=3)  # 44.1 kHz mono
    p = str(tmp_path / "x.mp3")
    with open(p, "wb") as f:
        f.write(data)
    ref = _oracle(p, 1, 16000)
    mono, _ = load_audio(p)
    assert mono.shape[0] == ref.shape[0]
    assert np.abs(mono - ref[:, 0]).max() <= 3.0 / 32768.0


def test_16k_is_passthrough(tmp_path):
    x = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    out = resample_ma(x, 16000, 16000)
    np.testing.assert_array_equal(out, x)

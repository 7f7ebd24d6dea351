"""Mel frontend: golden parity with the reference CPU implementation."""

import struct

import numpy as np

from whisper_tpu.audio.mel import (
    hann_window_periodic, log_mel_spectrogram, log_mel_spectrogram_jax,
    pad_audio)
from whisper_tpu.weights.ggml_reader import read_ggml_file

GOLDEN = "tests/golden/jfk_mel_ref.bin"


def _load_golden():
    raw = open(GOLDEN, "rb").read()
    n_len, n_len_org, n_mel = struct.unpack("<3i", raw[:12])
    ref = np.frombuffer(raw[12:], dtype="<f4").reshape(n_mel, n_len)
    return ref, n_len_org


def test_hann_window():
    w = hann_window_periodic()
    assert w.shape == (400,)
    assert abs(w[0]) < 1e-7
    assert abs(w[200] - 1.0) < 1e-6


def test_golden_mel_parity(jfk_pcm, stub_tiny_en_path):
    """Bit-level (float-rounding) parity with log_mel_spectrogram
    dumped from the reference build on samples/jfk.wav."""
    ref, ref_n_len_org = _load_golden()
    mf = read_ggml_file(stub_tiny_en_path)
    mel, n_len_org = log_mel_spectrogram(jfk_pcm, mf.filters)
    assert n_len_org == ref_n_len_org
    assert mel.T.shape == ref.shape
    np.testing.assert_allclose(mel.T, ref, atol=5e-5)


def test_padding_lengths():
    samples = np.zeros(16000, dtype=np.float32)  # 1 s
    padded, n_len, n_len_org = pad_audio(samples)
    assert len(padded) == 16000 + 480000 + 400
    assert n_len == (len(padded) - 400) // 160
    assert n_len_org == 1 + (16000 + 200 - 400) // 160


def test_jax_mel_matches_numpy(jfk_pcm, stub_tiny_en_path):
    import jax.numpy as jnp
    mf = read_ggml_file(stub_tiny_en_path)
    mel_np, _ = log_mel_spectrogram(jfk_pcm, mf.filters)
    padded, n_len, _ = pad_audio(jfk_pcm)
    mel_j = np.asarray(log_mel_spectrogram_jax(jnp.asarray(padded), mf.filters))
    assert mel_j.shape == mel_np.shape
    np.testing.assert_allclose(mel_j, mel_np, atol=2e-4)


def test_short_input():
    fb = read_ggml_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin").filters
    mel, n_len_org = log_mel_spectrogram(np.zeros(50, np.float32), fb)
    assert mel.shape[1] == 80
    assert np.isfinite(mel).all()

"""Pallas kernels vs their reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.audio.mel import _mel_from_padded_np, pad_audio
from whisper_tpu.weights.ggml_reader import read_ggml_file


def test_pallas_mel_matches_numpy(jfk_pcm, monkeypatch):
    """Run the fused mel kernel in interpreter mode (no TPU in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    from whisper_tpu.ops import mel_pallas

    filters = read_ggml_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin").filters
    padded, n_len, _ = pad_audio(jfk_pcm[:16000 * 4])
    ref = _mel_from_padded_np(padded, n_len, filters)

    with pltpu.force_tpu_interpret_mode():
        mel = np.asarray(mel_pallas.log_mel_pallas(jnp.asarray(padded), filters))

    n = mel.shape[0]
    assert n % mel_pallas.FRAMES_PER_BLOCK == 0
    np.testing.assert_allclose(mel[:n], ref[:n], atol=5e-4)

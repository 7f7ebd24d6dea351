"""Native C++ audio frontend vs the numpy implementation."""

import numpy as np
import pytest

from whisper_tpu.audio import native
from whisper_tpu.audio.mel import _mel_from_padded_np, pad_audio
from whisper_tpu.timestamps import get_signal_energy
from whisper_tpu.weights.ggml_reader import read_ggml_file

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_mel_matches_numpy(jfk_pcm):
    filters = read_ggml_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin").filters
    padded, n_len, n_len_org = pad_audio(jfk_pcm)
    mel_np = _mel_from_padded_np(padded, n_len, filters)
    mel_nat, org_nat = native.log_mel_spectrogram_native(jfk_pcm, filters)
    assert org_nat == n_len_org
    assert mel_nat.shape == mel_np.shape
    np.testing.assert_allclose(mel_nat, mel_np, atol=5e-5)


def test_native_energy_matches(jfk_pcm):
    e_np = get_signal_energy(jfk_pcm, 32)
    e_nat = native.signal_energy_native(jfk_pcm, 32)
    np.testing.assert_allclose(e_nat, e_np, atol=1e-6)

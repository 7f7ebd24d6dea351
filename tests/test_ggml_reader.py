"""Model-file reader tests against the reference stub models."""

import numpy as np
import pytest

from whisper_tpu.weights.ggml_reader import read_ggml_file


def test_stub_tiny_en(stub_tiny_en_path):
    mf = read_ggml_file(stub_tiny_en_path)
    hp = mf.hparams
    assert hp.n_vocab == 51864
    assert hp.n_audio_ctx == 1500
    assert hp.n_audio_state == 384
    assert hp.n_audio_head == 6
    assert hp.n_audio_layer == 4
    assert hp.n_text_ctx == 448
    assert hp.n_mels == 80
    assert hp.model_type == "tiny"
    assert mf.filters.shape == (80, 201)
    assert mf.n_loaded == 0  # stub: no tensors

    v = mf.vocab
    assert not v.is_multilingual
    assert v.token_eot == 50256
    assert v.token_sot == 50257
    assert v.token_beg == 50363
    assert v.token_str(v.token_beg) == "[_BEG_]"
    # timestamp tokens synthesized up to n_vocab
    assert v.token_str(hp.n_vocab - 1) == "[_TT_1500]"


def test_stub_multilingual_shift(stub_tiny_path):
    """Multilingual models shift special ids by +1 (reference:
    src/whisper.cpp:1638-1652)."""
    mf = read_ggml_file(stub_tiny_path)
    v = mf.vocab
    assert v.is_multilingual
    assert v.num_languages == 99
    assert v.token_eot == 50257
    assert v.token_sot == 50258
    assert v.token_beg == 50364
    assert v.token_lang(0) == v.token_sot + 1
    assert v.token_str(v.token_lang(0)) == "[_LANG_en]"


@pytest.mark.parametrize("name,model_type,layers", [
    ("base", "base", 6), ("small", "small", 12),
    ("medium", "medium", 24), ("large", "large", 32),
])
def test_model_type_inference(name, model_type, layers):
    mf = read_ggml_file(f"/root/reference/models/for-tests-ggml-{name}.bin")
    assert mf.hparams.n_audio_layer == layers
    assert mf.hparams.model_type == model_type


def test_filterbank_matches_shipped(stub_tiny_en_path):
    from whisper_tpu.audio.filters import mel_filterbank
    mf = read_ggml_file(stub_tiny_en_path)
    fb = mel_filterbank(80)
    np.testing.assert_allclose(fb, mf.filters, atol=1e-7)

"""Numerical parity against golden activations dumped from the actual
reference binary (whisper.cpp built CPU-only, run on a deterministic
random-weight model with real tiny dimensions).

The golden file tests/golden/tinyrand_acts_ref.bin holds:
    int32 ne0(=384), ne1(=1500), n_vocab, pad
    f32 encoder_out[ne1, ne0]        — state->embd_enc after whisper_encode
    f32 logits_prompt[n_vocab]       — last-token logits of [sot,100,200,300]
    f32 logits_step[n_vocab]         — logits of token 400 at n_past=4

The model is regenerated bit-identically by make_random_model(seed=7, ...).
"""

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_random_model

GOLDEN = "tests/golden/tinyrand_acts_ref.bin"


@pytest.fixture(scope="module")
def golden():
    raw = open(GOLDEN, "rb").read()
    ne0, ne1, n_vocab, _ = struct.unpack("<4i", raw[:16])
    off = 16
    enc = np.frombuffer(raw[off:off + 4 * ne0 * ne1], dtype="<f4").reshape(ne1, ne0)
    off += 4 * ne0 * ne1
    l1 = np.frombuffer(raw[off:off + 4 * n_vocab], dtype="<f4")
    off += 4 * n_vocab
    l2 = np.frombuffer(raw[off:off + 4 * n_vocab], dtype="<f4")
    return enc, l1, l2


@pytest.fixture(scope="module")
def tiny_random(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_model")
    path = make_random_model(tmp, seed=7, d=384, heads=6, enc_layers=4,
                             dec_layers=4, n_audio_ctx=1500, n_text_ctx=448,
                             ftype=1)
    from whisper_tpu.weights.convert import params_from_ggml
    from whisper_tpu.weights.ggml_reader import read_ggml_file
    mf = read_ggml_file(path)
    params, cfg = params_from_ggml(mf, dtype=jnp.float32)
    return mf, params, cfg


def test_encoder_and_logits_match_reference_binary(golden, tiny_random, jfk_pcm):
    from whisper_tpu.audio.mel import log_mel_spectrogram
    from whisper_tpu.models import whisper as wm

    enc_ref, l1_ref, l2_ref = golden
    mf, params, cfg = tiny_random

    mel, _ = log_mel_spectrogram(jfk_pcm, mf.filters)
    win = np.zeros((3000, 80), np.float32)
    win[:min(3000, mel.shape[0])] = mel[:3000]

    enc = np.asarray(wm.encode(params, jnp.asarray(win[None]), n_head=6,
                               compute_dtype=jnp.float32))[0]
    scale = np.abs(enc_ref).max()
    assert np.abs(enc - enc_ref).max() / scale < 0.01  # f16 weights + GELU LUT

    kc, vc = wm.cross_kv(params, jnp.asarray(enc[None]), n_head=6,
                         compute_dtype=jnp.float32)
    toks = np.array([[mf.vocab.token_sot, 100, 200, 300]], np.int32)
    mask = wm.make_causal_mask(4)
    logits, ks, vs = wm.decode_prompt(
        params, jnp.asarray(toks), jnp.arange(4), kc, vc,
        n_head=6, self_mask=mask, compute_dtype=jnp.float32)
    l1 = np.asarray(logits[0, -1])
    assert np.abs(l1 - l1_ref).max() / np.abs(l1_ref).max() < 0.01

    kv = {"k": jnp.zeros((4, 1, 6, 64, 16), jnp.float32),
          "v": jnp.zeros((4, 1, 6, 64, 16), jnp.float32)}
    kv["k"] = kv["k"].at[..., :4].set(ks.transpose(0, 1, 3, 4, 2))
    kv["v"] = kv["v"].at[..., :4].set(vs.transpose(0, 1, 3, 4, 2))
    lg, _ = wm.decode_step(
        params, jnp.asarray([400], jnp.int32), jnp.asarray([4], jnp.int32),
        jnp.int32(4), kv, kc, vc, kv_len=jnp.int32(5), n_head=6,
        compute_dtype=jnp.float32)
    l2 = np.asarray(lg[0])
    assert np.abs(l2 - l2_ref).max() / np.abs(l2_ref).max() < 0.01

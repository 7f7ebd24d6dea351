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


def test_quantized_matmul_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from whisper_tpu.ops.quantized import quantized_matmul, unpack_to_codes
    from whisper_tpu.weights import quant

    rng = np.random.RandomState(0)
    N, K, M = 256, 256, 8
    w = (rng.randn(N, K) * 0.05).astype(np.float32)
    raw = quant.quantize_q8_0(w)
    codes, scales, _ = unpack_to_codes(raw, quant.GGML_TYPE_Q8_0, (N, K))
    wd = quant.decode_tensor(raw, quant.GGML_TYPE_Q8_0, (N, K))
    x = rng.randn(M, K).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(quantized_matmul(
            jnp.asarray(x), jnp.asarray(np.ascontiguousarray(codes.T)),
            jnp.asarray(np.ascontiguousarray(scales.T))))
    ref = x @ wd.T
    assert np.abs(y - ref).max() / np.abs(ref).max() < 0.02


def test_unpack_to_codes_exact():
    from whisper_tpu.ops.quantized import unpack_to_codes
    from whisper_tpu.weights import quant

    rng = np.random.RandomState(1)
    w = (rng.randn(64, 128) * 0.1).astype(np.float32)
    for qt in (quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1,
               quant.GGML_TYPE_Q5_0, quant.GGML_TYPE_Q5_1,
               quant.GGML_TYPE_Q8_0):
        raw = quant.QUANTIZERS[qt](w)
        codes, scales, mins = unpack_to_codes(raw, qt, (64, 128))
        recon = codes.astype(np.float32) * np.repeat(scales, 32, axis=1)
        if mins is not None:
            recon = recon + np.repeat(mins, 32, axis=1)
        ref = quant.decode_tensor(raw, qt, (64, 128))
        np.testing.assert_allclose(recon, ref, atol=1e-6)


def test_cross_attention_kernel_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from whisper_tpu.ops.cross_attention import (
        cross_attention_decode, cross_attention_decode_q8, quantize_kv)

    rng = np.random.RandomState(0)
    B, H, Ta, Dh = 2, 4, 128, 64
    q = jnp.asarray(rng.randn(B, H, 1, Dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, Ta, Dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, Ta, Dh).astype(np.float32) * 0.3)

    qk = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * Dh ** -0.5
    w = np.exp(qk - qk.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", w, np.asarray(v))

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(cross_attention_decode(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16)))
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        out8 = np.asarray(cross_attention_decode_q8(
            q.astype(jnp.bfloat16), kq, ks, vq, vs))

    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02
    assert np.abs(out8 - ref).max() / np.abs(ref).max() < 0.03


def test_encoder_attention_matches_einsum():
    """ops/encoder_attention (fused scores-in-VMEM kernel) == einsum."""
    import jax.numpy as jnp
    from whisper_tpu.ops.encoder_attention import self_attention

    rng = np.random.RandomState(3)
    B, T, H, Dh = 2, 200, 4, 64          # T not a BLOCK_Q multiple: pad path
    q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.3)

    qk = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) * Dh ** -0.5
    w = np.exp(qk - qk.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", w, np.asarray(v)).reshape(B, T, H * Dh)

    out = np.asarray(self_attention(q, k, v, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02


def test_cross_attention_q8dt_matches_ref():
    """Lane-tight int8 decode kernel == f32 reference within quant error."""
    import jax.numpy as jnp
    from whisper_tpu.ops.cross_attention import (
        cross_attention_decode_q8dt, quantize_kv_bhdt)
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(4)
    B, H, Dh, Ta = 2, 4, 64, 256
    q = jnp.asarray(rng.randn(B, H, 1, Dh).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, Dh, Ta).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, Dh, Ta).astype(np.float32) * 0.3)

    qk = np.einsum("bhqd,bhdt->bhqt", np.asarray(q), np.asarray(k)) * Dh ** -0.5
    w = np.exp(qk - qk.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhqt,bhdt->bhqd", w, np.asarray(v))

    kq, ks = quantize_kv_bhdt(k)
    vq, vs = quantize_kv_bhdt(v)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(cross_attention_decode_q8dt(
            q.astype(jnp.bfloat16), kq, ks, vq, vs))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.03


def test_cross_kv_q8_matches_dense():
    """cross_kv_q8 (scan-fused quantization) dequantizes back to cross_kv."""
    import jax.numpy as jnp
    from whisper_tpu.models import whisper as wm
    from whisper_tpu.weights.convert import random_params
    from whisper_tpu.models.whisper import WhisperConfig

    cfg = WhisperConfig(128, 32, 64, 4, 2, 32, 64, 4, 2, 80, "test")
    params = random_params(cfg, seed=0, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    enc = jnp.asarray(rng.randn(2, 32, 64).astype(np.float32) * 0.3)

    kc, vc = wm.cross_kv(params, enc, n_head=4, compute_dtype=jnp.float32)
    (kq, ks), (vq, vs) = wm.cross_kv_q8(params, enc, n_head=4,
                                        compute_dtype=jnp.float32)
    k_deq = np.asarray(kq).astype(np.float32) * np.asarray(ks)[:, :, :, None, :]
    v_deq = np.asarray(vq).astype(np.float32) * np.asarray(vs)[:, :, :, None, :]
    assert np.abs(k_deq - np.asarray(kc)).max() <= np.abs(np.asarray(kc)).max() / 127 + 1e-6
    assert np.abs(v_deq - np.asarray(vc)).max() <= np.abs(np.asarray(vc)).max() / 127 + 1e-6


def test_quantized_matmul_mins_interpret():
    """q4_1/q5_1 path: the kernel's per-block offset ("m") branch matches
    a dense matmul against the exactly-decoded weights."""
    from jax.experimental.pallas import tpu as pltpu

    from whisper_tpu.ops.quantized import quantized_matmul, unpack_to_codes
    from whisper_tpu.weights import quant

    rng = np.random.RandomState(1)
    N, K, M = 256, 256, 8
    w = (rng.randn(N, K) * 0.05 + 0.01).astype(np.float32)
    for qfn, ttype in ((quant.quantize_q4_1, quant.GGML_TYPE_Q4_1),
                       (quant.quantize_q5_1, quant.GGML_TYPE_Q5_1)):
        raw = qfn(w)
        codes, scales, mins = unpack_to_codes(raw, ttype, (N, K))
        assert mins is not None
        wd = quant.decode_tensor(raw, ttype, (N, K))
        x = rng.randn(M, K).astype(np.float32)

        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(quantized_matmul(
                jnp.asarray(x), jnp.asarray(np.ascontiguousarray(codes.T)),
                jnp.asarray(np.ascontiguousarray(scales.T)),
                jnp.asarray(np.ascontiguousarray(mins.T))))
        ref = x @ wd.T
        assert np.abs(y - ref).max() / np.abs(ref).max() < 0.03, ttype


def test_encode_dt_matches_channels_last():
    """Channels-first encoder stack (attn_impl="pallas_dt") == the einsum
    channels-last path, in both output layouts, and the transpose-free
    cross_kv(enc_layout="bdt") == the standard cross_kv."""
    import jax.numpy as jnp
    from whisper_tpu.models import whisper as wm
    from whisper_tpu.models.whisper import WhisperConfig
    from whisper_tpu.weights.convert import random_params

    cfg = WhisperConfig(128, 32, 64, 4, 2, 32, 64, 4, 2, 80, "test")
    params = random_params(cfg, seed=0, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    mel = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32) * 0.3)

    ref = np.asarray(wm.encode(params, mel, n_head=4,
                               compute_dtype=jnp.float32, attn_impl="einsum"))
    out = np.asarray(wm.encode(params, mel, n_head=4,
                               compute_dtype=jnp.float32,
                               attn_impl="pallas_dt_interpret"))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 0.02

    out_dt = wm.encode(params, mel, n_head=4, compute_dtype=jnp.float32,
                       attn_impl="pallas_dt_interpret", out_layout="bdt")
    assert out_dt.shape == (2, 64, 32)
    assert np.abs(np.asarray(out_dt).transpose(0, 2, 1) - ref).max() / scale < 0.02

    kc, vc = wm.cross_kv(params, jnp.asarray(ref), n_head=4,
                         compute_dtype=jnp.float32)
    kc2, vc2 = wm.cross_kv(params, out_dt, n_head=4,
                           compute_dtype=jnp.float32, enc_layout="bdt")
    kscale = np.abs(np.asarray(kc)).max()
    assert np.abs(np.asarray(kc2) - np.asarray(kc)).max() / kscale < 0.02
    assert (np.abs(np.asarray(vc2) - np.asarray(vc)).max()
            / np.abs(np.asarray(vc)).max() < 0.02)

    # the quantized producers share _make_cross_proj: q8 codes from the
    # bdt input must dequantize to the same K within quant error
    (kq, ks), _ = wm.cross_kv_q8(params, out_dt, n_head=4,
                                 compute_dtype=jnp.float32, enc_layout="bdt")
    k_deq = np.asarray(kq).astype(np.float32) * np.asarray(ks)[:, :, :, None, :]
    assert np.abs(k_deq - np.asarray(kc)).max() <= kscale / 127 + kscale * 0.02


def test_encode_pf_btd_match_einsum():
    """The opt-in transpose-elimination variants (attn_impl="pallas_pf"
    projection-fused lane-tight QKV; "pallas_btd" fully transpose-free
    (B,T,D) kernel with head-group lane slices) == the einsum path.
    Both measured SLOWER than the default `pallas` on v5e (see
    docs/ROADMAP.md round-3 note) but stay available and correct."""
    import jax.numpy as jnp
    from whisper_tpu.models import whisper as wm
    from whisper_tpu.models.whisper import WhisperConfig
    from whisper_tpu.weights.convert import random_params

    cfg = WhisperConfig(128, 32, 64, 4, 2, 32, 64, 4, 2, 80, "test")
    params = random_params(cfg, seed=0, dtype=jnp.float32)
    rng = np.random.RandomState(13)
    mel = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32) * 0.3)

    ref = np.asarray(wm.encode(params, mel, n_head=4,
                               compute_dtype=jnp.float32, attn_impl="einsum"))
    scale = np.abs(ref).max()
    for impl in ("pallas_pf_interpret", "pallas_btd_interpret"):
        out = np.asarray(wm.encode(params, mel, n_head=4,
                                   compute_dtype=jnp.float32, attn_impl=impl))
        assert np.abs(out - ref).max() / scale < 0.02, impl

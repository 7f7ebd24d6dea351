"""Fused cross-attention decode kernel (Pallas).

Single-token decode reads the entire per-window cross-attention K/V
(L × Ta × D, ~0.5 GB per 30 s window per step for large-v3) — the dominant
HBM traffic of the token loop, bigger than the weights.  This kernel:

  * fuses QK^T -> softmax -> @V per (batch, head) grid cell, so the
    (B, H, Ta) score matrix never exists in HBM
  * optionally reads K/V as int8 with per-position scales (exact
    per-position rescaling: the scale folds into the logits for K and into
    the attention weights for V), halving the dominant traffic

Layout: K/V come in pre-transposed (B, H, Ta, Dh) — the transpose is done
once per window, amortized over all decode steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xattn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch, head) cell: q (1, Dh) x k/v (Ta, Dh) -> o (1, Dh)."""
    q = q_ref[0, 0]                                # (1, Dh)
    k = k_ref[0, 0]                                # (Ta, Dh)
    v = v_ref[0, 0]
    dh = q.shape[-1]
    qk = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (dh ** -0.5)   # (1, Ta)
    w = jax.nn.softmax(qk, axis=-1)
    o_ref[0, 0] = jnp.dot(w.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


def _xattn_kernel_q8(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref):
    """int8 K/V with per-position scales (B, H, Ta, 1) f32."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]                                # (Ta, Dh) int8
    v = v_ref[0, 0]
    ks = ks_ref[0, 0]                              # (Ta, 1)
    vs = vs_ref[0, 0]
    dh = q.shape[-1]
    qk = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    qk = qk * ks[:, 0][None, :] * (dh ** -0.5)
    w = jax.nn.softmax(qk, axis=-1)
    wv = w * vs[:, 0][None, :]
    o_ref[0, 0] = jnp.dot(wv.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


@jax.jit
def cross_attention_decode(q, k_t, v_t):
    """q: (B, H, 1, Dh); k_t/v_t: (B, H, Ta, Dh) -> (B, H, 1, Dh) f32."""
    B, H, _, Dh = q.shape
    Ta = k_t.shape[2]
    spec_q = pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, 1, Ta, Dh), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _xattn_kernel,
        grid=(B, H),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), jnp.float32),
    )(q, k_t, v_t)


@jax.jit
def cross_attention_decode_q8(q, k_q, k_s, v_q, v_s):
    """int8 K/V variant.  k_q/v_q: (B, H, Ta, Dh) int8;
    k_s/v_s: (B, H, Ta, 1) f32 per-position scales."""
    B, H, _, Dh = q.shape
    Ta = k_q.shape[2]
    spec_q = pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, 1, Ta, Dh), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1, Ta, 1), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _xattn_kernel_q8,
        grid=(B, H),
        in_specs=[spec_q, spec_kv, spec_s, spec_kv, spec_s],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), jnp.float32),
    )(q, k_q, k_s, v_q, v_s)


def _xattn_kernel_q8dt(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref):
    """Lane-tight int8 variant: one cell per BATCH row with all H heads
    resident (K+V ~4 MB VMEM at large-v3) — per-(b,h) cells measured
    launch-bound (the TPU grid is sequential; 640 tiny cells/layer lose).
    The int8->bf16 conversion happens in VMEM registers — the XLA einsum
    path materializes the converted bf16 copy through HBM every step,
    which is the decode loop's dominant cost at production batch."""
    q = q_ref[0]                                    # (H, 1, Dh) bf16
    k = k_ref[0]                                    # (H, Dh, Ta) int8
    v = v_ref[0]
    ks = ks_ref[0]                                  # (H, Ta) f32
    vs = vs_ref[0]
    dh = q.shape[-1]
    qk = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (H, 1, Ta)
    qk = qk * ks[:, None, :] * (dh ** -0.5)
    w = jax.nn.softmax(qk, axis=-1)
    wv = (w * vs[:, None, :]).astype(jnp.bfloat16)  # (H, 1, Ta)
    o = jax.lax.dot_general(
        wv, v.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (H, 1, Dh)
    o_ref[0] = o


@jax.jit
def cross_attention_decode_q8dt(q, k_q, k_s, v_q, v_s):
    """Single-token cross attention, cross_kv layout (lane-tight).

    q: (B, H, 1, Dh) bf16 — one query per (batch, head)
    k_q/v_q: (B, H, Dh, Ta) int8 (the cross_kv layout, no transpose)
    k_s/v_s: (B, H, Ta) f32 per-position scales
    -> (B, H, 1, Dh) f32
    """
    B, H, _, Dh = q.shape
    Ta = k_q.shape[-1]
    spec_q = pl.BlockSpec((1, H, 1, Dh), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, H, Dh, Ta), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, H, Ta), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _xattn_kernel_q8dt,
        grid=(B,),
        in_specs=[spec_q, spec_kv, spec_s, spec_kv, spec_s],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), jnp.float32),
    )(q, k_q, k_s, v_q, v_s)


@jax.jit
def quantize_kv(k):
    """(..., Ta, Dh) bf16/f32 -> (int8 codes, (..., Ta, 1) f32 scales).

    Arithmetic stays in the input dtype (an f32 upcast of a stacked
    (L, B, Ta, H, Dh) cross-KV would transiently need 4 bytes/elem of HBM
    — more than the budget the quantization is buying back).  bf16 rounding
    costs at most ±1 code near the extremes, well under the int8
    quantization error itself.
    """
    amax = jnp.max(jnp.abs(k), axis=-1, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    inv = (1.0 / scale).astype(k.dtype)
    q = jnp.clip(jnp.round(k * inv), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def quantize_kv_bhdt(k):
    """cross_kv layout (..., H, Dh, Ta) -> (int8 codes same layout,
    (..., H, Ta) f32 per-position scales).  Scale granularity is per
    (head, position) — identical to quantize_kv, different axis order."""
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 127.0            # (..., H, 1, Ta)
    inv = (1.0 / scale).astype(k.dtype)
    q = jnp.clip(jnp.round(k * inv), -127, 127).astype(jnp.int8)
    return q, scale[..., 0, :]                          # (..., H, Ta)


@jax.jit
def quantize_kv_bhdt_q4(k):
    """cross_kv layout (..., H, Dh, Ta) -> (uint8 nibble-packed
    (..., H, Dh//2, Ta), (..., H, Ta) f32 per-position scales).

    4-bit codes in [-8, 7] stored offset-binary (+8); even Dh indices in
    the low nibble, odd in the high.  Packing is manual (uint8 host of two
    s4 codes) because passing native jnp.int4 arrays across the jit
    boundary is broken in current JAX — and the consumer never unpacks in
    HBM anyway: the decode step contracts the low- and high-nibble halves
    as two separate MXU dots whose elementwise unpack fuses into the
    contraction's operand load (see models.whisper._cross_attn_step
    "q4e"), so the 2x HBM traffic saving is real.
    """
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 7.0              # (..., H, 1, Ta)
    inv = (1.0 / scale).astype(k.dtype)
    q = jnp.clip(jnp.round(k * inv), -8, 7).astype(jnp.int8) + 8
    lo = q[..., 0::2, :].astype(jnp.uint8)
    hi = q[..., 1::2, :].astype(jnp.uint8)
    return lo | (hi << 4), scale[..., 0, :]             # (..., H, Ta)


def unpack_q4_bhdt(packed, dtype=jnp.bfloat16):
    """Inverse of quantize_kv_bhdt_q4's packing (codes only, unscaled):
    (..., H, Dh//2, Ta) uint8 -> (..., H, Dh, Ta) in `dtype`, values in
    [-8, 7].  Used by the prompt pass, where the per-layer bf16 transient
    is amortized over the whole prompt block."""
    lo = ((packed & 0xF).astype(jnp.int8) - 8).astype(dtype)
    hi = ((packed >> 4).astype(jnp.int8) - 8).astype(dtype)
    stacked = jnp.stack([lo, hi], axis=-2)              # (..., Dh//2, 2, Ta)
    shp = packed.shape[:-2] + (2 * packed.shape[-2], packed.shape[-1])
    return stacked.reshape(shp)

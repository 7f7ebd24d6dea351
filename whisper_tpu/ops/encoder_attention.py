"""Fused encoder self-attention (Pallas).

The encoder's wall at production batch sizes is the materialized
(B, H, T, T) score matrix: for large-v3 at B=32 that is ~5.8 GB of f32 per
layer round-tripped through HBM for softmax (measured: softmax-related cost
is ~46% of encoder wall time; see docs/ROADMAP.md perf notes).  The
reference pays the same materialization in its non-flash path
(KQ = ggml_mul_mat + ggml_soft_max, reference: src/whisper.cpp:2128-2136).

This kernel keeps the whole score block in VMEM: per (batch, head, q-block)
grid cell it computes QK^T -> masked softmax -> @V with K/V for the head
resident in VMEM (at Whisper's T<=1500 and Dh=64, K+V are only ~400 KB —
no streaming/online-softmax machinery needed; the softmax is exact in one
pass).

Layout is lane-tight (B, H, Dh, T): Dh=64 would waste half of every
128-lane vector register and every DMA if it were the trailing dim.  The
transposes into this layout are done once per layer on (B, T, D)-sized
tensors — 20x smaller than the score traffic they remove.

Sized for VMEM: q-block 256, scores block (256, Tp) f32 = 1.6 MB at
Tp=1536, plus K/V 400 KB — comfortably under the ~16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int, scale: float):
    """One (b, h, q-block) cell.  Refs are (1, 1, Dh, Tq) / (1, 1, Dh, Tp)."""
    q = q_ref[0, 0]                                  # (Dh, Tq)
    k = k_ref[0, 0]                                  # (Dh, Tp)
    v = v_ref[0, 0]
    # scores (Tq, Tp) f32, never leaves VMEM
    qk = jax.lax.dot_general(
        q, k, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if t_valid < k.shape[-1]:
        mask = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1) < t_valid
        qk = jnp.where(mask, qk, -1e30)
    w = jax.nn.softmax(qk, axis=-1)
    # (Dh, Tp) x (Tq, Tp) contracted over Tp -> (Dh, Tq)
    o_ref[0, 0] = jax.lax.dot_general(
        v, w.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("t_valid", "interpret"))
def encoder_attention(q, k, v, t_valid: int | None = None,
                      interpret: bool = False):
    """q/k/v: (B, H, Dh, T) — returns (B, H, Dh, T) f32 attention output.

    T must be a multiple of BLOCK_Q (pad with zeros and pass the true
    length as t_valid; padded query columns come back as garbage and must
    be sliced off by the caller — `self_attention` below does all of it).
    """
    B, H, Dh, Tp = q.shape
    assert Tp % BLOCK_Q == 0, (Tp, BLOCK_Q)
    if t_valid is None:
        t_valid = Tp
    spec_q = pl.BlockSpec((1, 1, Dh, BLOCK_Q),
                          lambda b, h, i: (b, h, 0, i),
                          memory_space=pltpu.VMEM)
    # K/V index maps ignore the q-block index -> fetched once per (b, h)
    spec_kv = pl.BlockSpec((1, 1, Dh, Tp), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_attn_kernel, t_valid=t_valid,
                             scale=Dh ** -0.5)
    return pl.pallas_call(
        kern,
        grid=(B, H, Tp // BLOCK_Q),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh, Tp), jnp.float32),
        interpret=interpret,
    )(q, k, v)


def self_attention(q, k, v, compute_dtype=jnp.bfloat16, interpret=False):
    """Drop-in for models.whisper._attention: q/k/v (B, T, H, Dh) ->
    (B, T, H*Dh) f32.  Handles layout + padding around the kernel."""
    B, T, H, Dh = q.shape
    Tp = ((T + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q

    def prep(x):
        x = x.transpose(0, 2, 3, 1).astype(compute_dtype)   # (B, H, Dh, T)
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Tp - T)))
        return x

    out = encoder_attention(prep(q), prep(k), prep(v), t_valid=T,
                            interpret=interpret)
    out = out[..., :T].transpose(0, 3, 1, 2)                # (B, T, H, Dh)
    return out.reshape(B, T, H * Dh)


def _attn_btd_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int,
                     heads_per_group: int, dh: int, scale: float):
    """One (b, head-group, q-block) cell; refs are (1, TQ, Dg) /
    (1, Tp, Dg) channels-last blocks with Dg = heads_per_group * dh —
    no transposed layout exists anywhere.  Heads are static lane
    slices; the small head loop unrolls."""
    q = q_ref[0]                                    # (TQ, Dg)
    k = k_ref[0]                                    # (Tp, Dg)
    v = v_ref[0]
    TQ = q.shape[0]
    Tp = k.shape[0]
    mask = None
    if t_valid < Tp:
        mask = jax.lax.broadcasted_iota(jnp.int32, (TQ, Tp), 1) < t_valid
    for h in range(heads_per_group):
        sl = slice(h * dh, (h + 1) * dh)
        qk = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (TQ, Tp)
        if mask is not None:
            qk = jnp.where(mask, qk, -1e30)
        w = jax.nn.softmax(qk, axis=-1)
        o_ref[0, :, sl] = jax.lax.dot_general(
            w.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "t_valid",
                                             "interpret"))
def encoder_attention_btd(q, k, v, n_head: int, t_valid: int | None = None,
                          interpret: bool = False):
    """Transpose-free fused attention: q/k/v (B, Tp, D) channels-last ->
    (B, Tp, D) f32.  Tp must be a BLOCK_Q multiple (pad + t_valid like
    encoder_attention).  Reads the projection GEMMs' natural output
    layout, so the per-layer (B,T,H,Dh)<->(B,H,Dh,T) transposes of the
    self_attention wrapper disappear entirely.

    The grid carries a head-group axis sized so each group is 128 lanes
    (2 heads at Dh=64): K/V blocks stay ~400 KB and the lane slices
    inside the kernel are register-width aligned."""
    B, Tp, D = q.shape
    assert Tp % BLOCK_Q == 0, (Tp, BLOCK_Q)
    assert D % n_head == 0
    dh = D // n_head
    heads_per_group = max(1, 128 // dh)
    while n_head % heads_per_group:
        heads_per_group //= 2
    G = n_head // heads_per_group
    Dg = heads_per_group * dh
    if t_valid is None:
        t_valid = Tp
    spec_q = pl.BlockSpec((1, BLOCK_Q, Dg), lambda b, g, i: (b, i, g),
                          memory_space=pltpu.VMEM)
    # K/V index maps ignore the q-block index -> fetched once per (b, g)
    spec_kv = pl.BlockSpec((1, Tp, Dg), lambda b, g, i: (b, 0, g),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_attn_btd_kernel, t_valid=t_valid,
                             heads_per_group=heads_per_group, dh=dh,
                             scale=dh ** -0.5)
    return pl.pallas_call(
        kern,
        grid=(B, G, Tp // BLOCK_Q),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32),
        interpret=interpret,
    )(q, k, v)

"""Quantized-weight matmul: Pallas dequant-in-prologue kernel.

The reference ships block-quantized models (Q4/Q5/Q8, 32-element blocks with
an f16 scale — reference: ggml/src/ggml-common.h:167-214) and dequantizes
inside its mat-mul kernels (ggml-cuda mmq, CPU quant dot products).  The
TPU equivalent here keeps weights in HBM as int8 codes + per-block scales
(half the bytes of bf16) and dequantizes tiles in VMEM right before the MXU
contraction — decode steps are HBM-bandwidth-bound, so halving weight bytes
is a direct speedup.

Unified representation (ops on it are exact for every supported type):
    codes:  (N, K) int8   — the quantized integers (q4: -8..7, q5: -16..15,
                            q8: -128..127)
    scales: (N, K//32) f32 — block scales d
    mins:   (N, K//32) f32 or None — block offsets m (q4_1/q5_1 only)
so  W[n, k] = codes[n, k] * scales[n, k//32] (+ mins[n, k//32])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..weights import quant

QK = quant.QK  # 32


# ---------------------------------------------------------------------------
# repacking: raw ggml bytes -> (codes, scales, mins)
# ---------------------------------------------------------------------------

def unpack_to_codes(raw: bytes, ttype: int,
                    shape: tuple[int, int]) -> tuple[np.ndarray, np.ndarray,
                                                     np.ndarray | None]:
    """Raw quantized tensor bytes -> (int8 codes, f32 scales, f32 mins|None).

    Bit-exact with quant.decode_tensor: codes * scales (+ mins) == decoded.
    """
    n, k = shape
    nb = (n * k) // QK

    def blocks(block_bytes):
        return np.frombuffer(raw, dtype=np.uint8).reshape(nb, block_bytes)

    if ttype == quant.GGML_TYPE_Q8_0:
        b = blocks(2 + QK)
        scales = b[:, :2].copy().view(np.float16).astype(np.float32)
        codes = b[:, 2:].copy().view(np.int8)
        mins = None
    elif ttype == quant.GGML_TYPE_Q4_0:
        b = blocks(2 + QK // 2)
        scales = b[:, :2].copy().view(np.float16).astype(np.float32)
        qs = b[:, 2:]
        lo = (qs & 0x0F).astype(np.int8) - 8
        hi = (qs >> 4).astype(np.int8) - 8
        codes = np.concatenate([lo, hi], axis=1)
        mins = None
    elif ttype == quant.GGML_TYPE_Q4_1:
        b = blocks(4 + QK // 2)
        scales = b[:, 0:2].copy().view(np.float16).astype(np.float32)
        mins = b[:, 2:4].copy().view(np.float16).astype(np.float32)
        qs = b[:, 4:]
        codes = np.concatenate([(qs & 0x0F), (qs >> 4)], axis=1).astype(np.int8)
    elif ttype == quant.GGML_TYPE_Q5_0:
        b = blocks(2 + 4 + QK // 2)
        scales = b[:, 0:2].copy().view(np.float16).astype(np.float32)
        xh0, xh1 = quant._q5_high_bits(b[:, 2:6])
        qs = b[:, 6:]
        lo = (((qs & 0x0F).astype(np.int32)) | xh0) - 16
        hi = (((qs >> 4).astype(np.int32)) | xh1) - 16
        codes = np.concatenate([lo, hi], axis=1).astype(np.int8)
        mins = None
    elif ttype == quant.GGML_TYPE_Q5_1:
        b = blocks(4 + 4 + QK // 2)
        scales = b[:, 0:2].copy().view(np.float16).astype(np.float32)
        mins = b[:, 2:4].copy().view(np.float16).astype(np.float32)
        xh0, xh1 = quant._q5_high_bits(b[:, 4:8])
        qs = b[:, 8:]
        lo = ((qs & 0x0F).astype(np.int32)) | xh0
        hi = ((qs >> 4).astype(np.int32)) | xh1
        codes = np.concatenate([lo, hi], axis=1).astype(np.int8)
    else:
        raise ValueError(f"not a supported quantized type: {ttype}")

    codes = codes.reshape(n, k)
    scales = scales.reshape(n, k // QK)
    if mins is not None:
        mins = mins.reshape(n, k // QK)
    return codes, scales, mins


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, codes_ref, scales_ref, acc_ref):
    """Grid (M/BM, N/BN, K/BK); K is the reduction axis (innermost).

    Weights are stored K-major so every tile is VMEM-tileable:
      x:      (BM, BK)       f32/bf16
      codes:  (BK, BN)       int8   — W^T codes
      scales: (BK//32, BN)   f32    — W^T block scales
      acc:    (BM, BN)       f32    — accumulated over the K grid dim
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:]
    wt = codes.astype(jnp.bfloat16) * jnp.repeat(
        scales_ref[:].astype(jnp.bfloat16), QK, axis=0)

    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), wt,
                          preferred_element_type=jnp.float32)


def _qmm_kernel_mins(x_ref, codes_ref, scales_ref, mins_ref, acc_ref):
    """_qmm_kernel with per-block offsets (q4_1/q5_1: W = q*d + m)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:]
    wt = (codes.astype(jnp.bfloat16)
          * jnp.repeat(scales_ref[:].astype(jnp.bfloat16), QK, axis=0)
          + jnp.repeat(mins_ref[:].astype(jnp.bfloat16), QK, axis=0))

    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), wt,
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k"))
def quantized_matmul(x, codes_t, scales_t, mins_t=None, block_m: int = 512,
                     block_n: int = 512, block_k: int = 512):
    """y = x @ W^T with W = codes * scales (+ mins) (block-32), W^T K-major.

    x: (M, K); codes_t: (K, N) int8; scales_t: (K//32, N) f32;
    mins_t: (K//32, N) f32 or None (q4_1/q5_1 block offsets) -> (M, N) f32.
    """
    m, k = x.shape
    n = codes_t.shape[1]
    bm = min(block_m, m)   # single-token decode: m is small, one block
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    bk = min(block_k, k)
    while k % bk:
        bk //= 2
    assert bn >= 128 and bk >= QK, (n, k, bn, bk)
    grid_m = pl.cdiv(m, bm)

    scale_spec = pl.BlockSpec((bk // QK, bn), lambda g, i, j: (j, i),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda g, i, j: (g, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda g, i, j: (j, i),
                     memory_space=pltpu.VMEM),
        scale_spec,
    ]
    args = [x, codes_t, scales_t]
    kernel = _qmm_kernel
    if mins_t is not None:
        in_specs.append(scale_spec)
        args.append(mins_t)
        kernel = _qmm_kernel_mins

    return pl.pallas_call(
        kernel,
        grid=(grid_m, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda g, i, j: (g, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*args)


def dequantize_weights(codes, scales, mins=None, dtype=jnp.bfloat16):
    """Full dequantization (fallback path / encoder weights)."""
    w = codes.astype(jnp.float32) * jnp.repeat(scales, QK, axis=1)
    if mins is not None:
        w = w + jnp.repeat(mins, QK, axis=1)
    return w.astype(dtype)

"""Fused Pallas log-mel kernel.

One kernel fuses framing, Hann windowing, the real DFT (as two MXU
matmuls), the power spectrum, the mel filterbank, and the log10 — the
per-frame pipeline of the reference's CPU mel worker
(reference: src/whisper.cpp:3115-3178) — without ever materializing the
(n_frames, 400) frame matrix in HBM.

Framing trick: with hop 160 and window 400 = 2*160 + 80, frame i is the
concatenation of 160-sample rows i, i+1 and the first half of row i+2 of
the audio viewed as (n, 160).  So a block of F frames needs only rows
[i, i+F+2) — three static slices instead of a gather.

The final global clamp/normalize (max-8, (x+4)/4) needs a global max, so
it runs as trailing XLA ops in `log_mel_pallas`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import _dft_basis, hann_window_periodic
from ..constants import HOP_LENGTH, N_FFT

FRAMES_PER_BLOCK = 256
N_BINS = N_FFT // 2 + 1  # 201


def _mel_kernel(r0_ref, r1_ref, r2_ref, hann_ref, cos_ref, sin_ref,
                filt_ref, out_ref):
    """One grid step: FRAMES_PER_BLOCK frames -> (F, n_mel) log-mel."""
    frames = jnp.concatenate(
        [r0_ref[:], r1_ref[:], r2_ref[:]], axis=1)       # (F, 400)
    frames = frames * hann_ref[:]

    hi = jax.lax.Precision.HIGHEST  # f32 on MXU: the result feeds log10
    re = jnp.dot(frames, cos_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im                            # (F, 201 padded)

    mel = jnp.dot(power, filt_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_len",))
def _mel_blocks(rows0, rows1, rows2, hann, cos_b, sin_b, filters_t, *, n_len):
    n_mel = filters_t.shape[1]
    grid = (n_len // FRAMES_PER_BLOCK,)
    F = FRAMES_PER_BLOCK
    return pl.pallas_call(
        _mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, HOP_LENGTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, HOP_LENGTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, N_FFT - 2 * HOP_LENGTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_FFT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BINS, n_mel), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, n_mel), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_len, n_mel), jnp.float32),
    )(rows0, rows1, rows2, hann, cos_b, sin_b, filters_t)


def log_mel_pallas(padded_audio: jnp.ndarray, filters) -> jnp.ndarray:
    """Padded audio (see audio.mel.pad_audio) -> (n_len, n_mel) log-mel.

    n_len is rounded down to a FRAMES_PER_BLOCK multiple of the padded
    signal; since the reference zero-pads 30 s past the real audio, the
    trailing (all-silence) frames beyond the window budget never matter —
    callers slice what they need.
    """
    n = padded_audio.shape[-1]
    n_len = (n - N_FFT) // HOP_LENGTH
    n_len_blk = (n_len // FRAMES_PER_BLOCK) * FRAMES_PER_BLOCK

    n_rows = n_len_blk + 2
    rows = padded_audio[: n_rows * HOP_LENGTH].reshape(n_rows, HOP_LENGTH)
    rows0 = rows[0:n_len_blk]
    rows1 = rows[1:n_len_blk + 1]
    rows2 = rows[2:n_len_blk + 2, :N_FFT - 2 * HOP_LENGTH]

    hann = jnp.asarray(hann_window_periodic())[None, :]
    cos_b, sin_b = _dft_basis()
    filters_t = jnp.asarray(filters, jnp.float32).T        # (201, n_mel)

    mel = _mel_blocks(rows0, rows1, rows2, hann, jnp.asarray(cos_b),
                      jnp.asarray(sin_b), filters_t, n_len=n_len_blk)

    mmax = jnp.max(mel) - 8.0
    return (jnp.maximum(mel, mmax) + 4.0) / 4.0

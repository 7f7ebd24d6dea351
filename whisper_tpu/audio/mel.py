"""Log-mel spectrogram frontend.

Bit-compatible with the reference CPU frontend
(reference: src/whisper.cpp:3008-3271 `log_mel_spectrogram`), which in turn
mirrors openai/whisper audio.py:110-157:

  1. pad: 200-sample reflect at the start, 30 s of zeros + 200*2 at the end
  2. frame: hop 160, periodic Hann window of 400
  3. power spectrum: |rfft|^2, bins 0..200
  4. mel: filterbank (from the model file) . power
  5. log10(max(., 1e-10)), clamp to global max - 8, (x + 4) / 4

The reference computes its FFT with a hand-written radix-2 Cooley-Tukey
(whisper.cpp:3049-3113) — an exact DFT, so numpy/XLA rfft matches to float
rounding.  Frames whose window lies entirely in the zero padding shortcut to
log10(1e-10) in the reference; windowing the zero-padded signal produces the
same value, so a single vectorized pass is exact.

Two implementations:
  * `log_mel_spectrogram` — host numpy, any length (orchestrator path)
  * `log_mel_spectrogram_jax` — jnp, static shape, jit/batch-friendly
    (used by the fused transcription pipeline and benchmarks)
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import CHUNK_SIZE, HOP_LENGTH, N_FFT, SAMPLE_RATE


@functools.lru_cache(maxsize=1)
def hann_window_periodic(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann, computed in f32 like the reference
    (reference: src/whisper.cpp:3034-3043)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def pad_audio(samples: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Stage-1/2 padding (reference: src/whisper.cpp:3199-3219).

    Returns (padded, n_len, n_len_org):
      n_len     — total frames in the padded spectrogram
      n_len_org — frames covering the real audio (drives seek_end)
    """
    n_samples = len(samples)
    stage_1_pad = SAMPLE_RATE * CHUNK_SIZE      # 480000
    stage_2_pad = N_FFT // 2                    # 200

    # int16 input stays int16 (the batched device-mel path keeps s16le PCM
    # packed until after the on-device window slice — halves the h2d bytes);
    # everything else is f32
    dtype = np.int16 if samples.dtype == np.int16 else np.float32
    padded = np.zeros(n_samples + stage_1_pad + 2 * stage_2_pad, dtype=dtype)
    padded[stage_2_pad:stage_2_pad + n_samples] = samples
    # reflective pad at the beginning: samples[1..200] reversed
    padded[:stage_2_pad] = samples[1:1 + stage_2_pad][::-1]

    n_len = (len(padded) - N_FFT) // HOP_LENGTH
    n_len_org = 1 + (n_samples + stage_2_pad - N_FFT) // HOP_LENGTH
    return padded, n_len, n_len_org


def _mel_from_padded_np(padded: np.ndarray, n_len: int,
                        filters: np.ndarray) -> np.ndarray:
    window = hann_window_periodic()
    idx = np.arange(n_len)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = padded[idx] * window[None, :]

    spec = np.fft.rfft(frames.astype(np.float32), n=N_FFT, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)  # (n_len, 201)

    mel = power @ filters.astype(np.float32).T                    # (n_len, n_mel)
    mel = np.log10(np.maximum(mel, 1e-10))

    mmax = mel.max() - 8.0
    mel = (np.maximum(mel, mmax) + 4.0) / 4.0
    return mel.astype(np.float32)                                 # (n_len, n_mel)


def log_mel_spectrogram(samples: np.ndarray,
                        filters: np.ndarray) -> tuple[np.ndarray, int]:
    """PCM f32 mono @16 kHz -> ((n_len, n_mel) f32 mel, n_len_org).

    The returned mel includes the trailing 30 s zero-pad region so a full
    window starting at any seek offset < n_len_org is always available —
    identical to the reference's whisper_mel buffer.
    """
    samples = np.asarray(samples)
    if samples.dtype == np.int16:
        samples = samples.astype(np.float32) / 32768.0
    samples = samples.astype(np.float32, copy=False)
    if len(samples) < 1 + N_FFT // 2:
        # too short for the reflect pad; zero-extend like a silent signal
        samples = np.pad(samples, (0, 1 + N_FFT // 2 - len(samples)))

    # prefer the native C++ frontend when built (threads, ~2x numpy)
    import os
    if os.environ.get("WTPU_NO_NATIVE") != "1":
        from .native import log_mel_spectrogram_native
        res = log_mel_spectrogram_native(samples, filters)
        if res is not None:
            return res

    padded, n_len, n_len_org = pad_audio(samples)
    mel = _mel_from_padded_np(padded, n_len, filters)
    return mel, n_len_org


# ---------------------------------------------------------------------------
# JAX version — static shapes, used inside the jitted batched pipeline
# ---------------------------------------------------------------------------

def log_mel_spectrogram_jax(samples, filters):
    """jnp mel for a fixed-length signal; returns (n_len, n_mel).

    `samples` must already be the exact padded-signal layout produced by
    `pad_audio` (static shape).  Runs on TPU: framing is a gather, the DFT is
    two (400, 201) matmuls on the MXU, the filterbank is one more matmul.
    """
    import jax
    import jax.numpy as jnp

    n_len = (samples.shape[-1] - N_FFT) // HOP_LENGTH
    window = jnp.asarray(hann_window_periodic())

    idx = (jnp.arange(n_len)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])
    frames = samples[..., idx] * window

    # real DFT as two matmuls (TPU-friendly; avoids odd-size FFT lowering).
    # HIGHEST precision: the result feeds log10 + global-max normalization,
    # so bf16-passed MXU accumulation visibly corrupts quiet mel bins.
    cos_b, sin_b = _dft_basis()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im

    mel = jnp.dot(power, jnp.asarray(filters, dtype=jnp.float32).T,
                  precision=hi, preferred_element_type=jnp.float32)
    mel = jnp.log10(jnp.maximum(mel, 1e-10))
    mmax = jnp.max(mel, axis=(-1, -2), keepdims=True) - 8.0
    return (jnp.maximum(mel, mmax) + 4.0) / 4.0


@functools.lru_cache(maxsize=1)
def _dft_basis() -> tuple[np.ndarray, np.ndarray]:
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(N_FFT // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)

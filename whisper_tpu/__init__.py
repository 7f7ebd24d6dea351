"""whisper_tpu — a TPU-native speech-recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ggerganov/whisper.cpp (the reference implementation): same model files,
same API surface and decoding behavior, redesigned for TPUs — batched
windows on the MXU, a fully on-device autoregressive loop, sharding over
device meshes instead of a backend scheduler.
"""

import os as _os

# Persistent XLA compilation cache: fresh processes (CLI invocations, the
# C ABI's embedded interpreter, servers restarting) reuse compiled window
# loops instead of paying 30-120 s of jit each. Opt out with
# WTPU_NO_COMPILE_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR.
if _os.environ.get("WTPU_NO_COMPILE_CACHE") != "1":
    # per-user path: a fixed world-shared /tmp name would collide between
    # users (permission failures) and let a local attacker pre-seed
    # serialized executables another user's process would deserialize
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.environ.get("XDG_CACHE_HOME")
                      or _os.path.expanduser("~/.cache"),
                      "wtpu_jax_cache")
        if _os.access(_os.path.expanduser("~"), _os.W_OK)
        else f"/tmp/wtpu_jax_cache_{_os.getuid()}")
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # pragma: no cover - ancient jax
        pass

# Honor an explicit JAX_PLATFORMS pin even on containers whose
# sitecustomize force-registers a TPU plugin after env processing (same
# handling as bench.py / tests/conftest.py — without this, surfaces
# launched with JAX_PLATFORMS=cpu would silently grab the TPU).
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover
        pass

from .api import (
    BeamSearchParams,
    FullParams,
    GreedyParams,
    SamplingStrategy,
    Segment,
    TokenData,
    WhisperContext,
    full_default_params,
)
from .constants import CHUNK_SIZE, HOP_LENGTH, N_FFT, SAMPLE_RATE
from .languages import lang_id, lang_max_id, lang_str, lang_str_full
from .utils.logging import log_set

__version__ = "0.1.0"

__all__ = [
    "WhisperContext", "FullParams", "GreedyParams", "BeamSearchParams",
    "SamplingStrategy", "Segment", "TokenData", "full_default_params",
    "SAMPLE_RATE", "N_FFT", "HOP_LENGTH", "CHUNK_SIZE",
    "lang_id", "lang_str", "lang_str_full", "lang_max_id", "log_set",
]

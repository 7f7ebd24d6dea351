"""Microbench: decode_step cost with bf16 vs float8_e4m3 self-KV cache.

Serving shapes: large-v3, B=64 (bench.py's default serving batch), carried
prompt bucket C=137 = P + N + 1 with P=72 (the carried-past bucket at
serving's n_max_text_ctx) and N=64 (max_tokens=64 loop bound), token 50258
is <|startoftranscript|>.  Runs a lax.scan of 32 decode_steps (the loop
body cost dominates).  The cross/self-KV contents are random and the
prompt region [0, P) of the self-KV cache is intentionally zeros: this is
a cost-only bench (argmax feedback re-enters the loop, but the numerics
are not meant to be representative).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import WhisperConfig, MODEL_DIMS, decode_step
from whisper_tpu.models import whisper as wm
from whisper_tpu.weights.convert import random_params

cfg = WhisperConfig(*MODEL_DIMS["large-v3"], model_type="large-v3")
L, H, Dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim_text
B, C, P = 64, 137, 72
Ta = cfg.n_audio_ctx
params = random_params(cfg, seed=0, dtype=jnp.bfloat16)

rng = np.random.RandomState(0)
# q8 cross-KV at (L, B, H, Dh, Ta) codes + (L, B, H, Ta) scales
kq = jnp.asarray(rng.randint(-127, 127, (L, B, H, Dh, Ta), dtype=np.int8))
ks = jnp.asarray(rng.rand(L, B, H, Ta).astype(np.float32) * 0.05)
vq = jnp.asarray(rng.randint(-127, 127, (L, B, H, Dh, Ta), dtype=np.int8))
vs = jnp.asarray(rng.rand(L, B, H, Ta).astype(np.float32) * 0.05)
k_cross = ("q8e", kq, ks)
v_cross = ("q8e", vq, vs)

tokens0 = jnp.full((B,), 50258, jnp.int32)
pos0 = jnp.full((B,), P, jnp.int32)

def make_run(kv_dtype):
    kv0 = {"k": jnp.zeros((L, B, H, Dh, C), kv_dtype),
           "v": jnp.zeros((L, B, H, Dh, C), kv_dtype)}

    @jax.jit
    def run(params, kv):
        def body(carry, i):
            kv, tok = carry
            logits, kv = decode_step(
                params, tok, pos0 + i, P + i, kv, k_cross, v_cross,
                P + i + 1, n_head=H)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (kv, tok), logits[0, 0]
        (kv, tok), out = jax.lax.scan(body, (kv, tokens0), jnp.arange(32))
        return tok, out.sum()

    return run, kv0

for name, dt in [("bf16", jnp.bfloat16),
                 # resolved defensively: older JAX builds lack float8 dtypes
                 ("f8e4m3", getattr(jnp, "float8_e4m3fn", None)),
                 ("f8e5m2", getattr(jnp, "float8_e5m2", None))]:
    if dt is None:
        print(f"{name}: SKIPPED (dtype not in this JAX build)")
        continue
    try:
        run, kv0 = make_run(dt)
        tok, s = run(params, kv0)
        np.asarray(s)  # compile + fence
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            tok, s = run(params, kv0)
            np.asarray(s)
            times.append(time.perf_counter() - t0)
        ms = min(times) / 32 * 1000
        print(f"{name}: {ms:.3f} ms/step (32-step scan, B={B}, C={C})")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

#!/usr/bin/env python3
"""Attribute the batched-beam window decoder's wall time on the current
device (tools for the serving beam-5 tier, reference bar:
scripts/bench-all-gg.txt beam rows — the reference's beam-5 runs several
times slower than its greedy; ours should not).

Times, at exact model dims with on-device random weights:
  1. the PRODUCTION beam window fn (ctx._beam_batch_window_fn) per call,
     at each requested stream count S (K beams per stream, R = S*K rows);
  2. isolated per-step pieces, each as a 65-step chained loop so the
     device pipeline behaves like the real while_loop:
       - the beam-reorder KV gather  kv[:, parent]  (read+write 2x KV)
       - the decoder token step (self-attn over C, q8 cross-attn, MLP)
       - the per-stream top-k over (S, K*V) continuation scores
so the gap between (sum of pieces) and (whole fn) is visible, and the
dominant piece is a measured number rather than a roofline guess.

Usage:  python tools/beam_profile.py --size large-v3 --streams 12 24 32
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large-v3")
    ap.add_argument("--streams", type=int, nargs="+", default=[12, 24, 32])
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=72,
                    help="prompt bucket P (serving n_max_text_ctx=64 -> 72)")
    ap.add_argument("--skip-pieces", action="store_true")
    args = ap.parse_args()

    import whisper_tpu as wt
    from whisper_tpu.decode.filters import FilterOptions
    from whisper_tpu.models import whisper as wm

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    ctx = wt.WhisperContext.from_random(args.size, seed=0,
                                        cross_mode="einsum_q8")
    print(f"ctx ready in {time.perf_counter() - t0:.1f}s", flush=True)
    cfg = ctx.config
    K = args.beams
    P = args.prompt
    N = args.tokens + 1
    C = P + N + 1
    H, Dh, L = cfg.n_text_head, cfg.head_dim_text, cfg.n_text_layer
    V = cfg.n_vocab
    Ta = cfg.n_audio_ctx
    n_mels = cfg.n_mels

    @jax.jit
    def enc_fn(params, mel):
        enc = wm.encode(params, mel, n_head=cfg.n_audio_head)
        (kq, ks), (vq, vs) = wm.cross_kv_q8(params, enc,
                                            n_head=cfg.n_text_head)
        return kq, ks, vq, vs

    opts = FilterOptions()
    results = {}
    for S in args.streams:
        R = S * K
        mel = jnp.asarray(np.random.RandomState(0).randn(
            S, 2 * Ta, n_mels).astype(np.float32) * 0.1)
        t_enc = timeit(enc_fn, (ctx.params, mel))
        kq, ks, vq, vs = enc_fn(ctx.params, mel)
        kc, vc = (kq, ks), (vq, vs)

        fn = ctx._beam_batch_window_fn(S, K, P, opts, False, True,
                                       args.tokens)
        prompt = np.full((S, P), 50257, np.int32)
        pad_len = np.full((S,), P - 4, np.int32)
        seeks = np.zeros((S,), np.int32)
        ends = np.full((S,), 30000, np.int32)
        keys = np.arange(2 * S, dtype=np.uint32).reshape(S, 2)
        live = np.ones((S,), bool)

        def whole(params, kc, vc):
            return fn(params, kc, vc, prompt, pad_len, 0.0, seeks, ends,
                      keys, live)

        tc0 = time.perf_counter()
        whole(ctx.params, kc, vc)           # compile
        t_compile = time.perf_counter() - tc0
        t1 = time.perf_counter()
        for _ in range(3):
            out = whole(ctx.params, kc, vc)
        t_whole = (time.perf_counter() - t1) / 3
        n_tok = int(out["n_tokens"])
        print(f"S={S:3d} R={R:3d}: encode {t_enc*1e3:8.1f} ms   "
              f"beam window {t_whole*1e3:8.1f} ms "
              f"({n_tok} steps, compile {t_compile:.0f}s)   "
              f"window rtf = {S*30/(t_enc+t_whole):7.1f}x", flush=True)
        results[S] = (t_enc, t_whole)

        if args.skip_pieces or S != args.streams[0]:
            continue

        # ---- piece 1: the beam-reorder KV gather, 65 chained ------------
        kv_k = jnp.zeros((L, R, H, Dh, C), jnp.bfloat16) + 0.5
        kv_v = jnp.zeros((L, R, H, Dh, C), jnp.bfloat16) + 0.5
        within = (np.arange(R) % K + 1) % K          # rotate beams
        parent = jnp.asarray(within + (np.arange(R) // K) * K, jnp.int32)

        @jax.jit
        def gather_loop(kv_k, kv_v):
            def body(i, c):
                a, b = c
                return a[:, parent], b[:, parent]
            return jax.lax.fori_loop(0, N, body, (kv_k, kv_v))

        t_gather = timeit(gather_loop, (kv_k, kv_v), iters=2)

        # ---- piece 2: the decoder token step, 65 chained -----------------
        tag = "q8e"
        kc_l = (tag,) + tuple(kc)
        vc_l = (tag,) + tuple(vc)
        pad_r = jnp.asarray(np.repeat(pad_len, K))

        @jax.jit
        def step_loop(params, kv_k, kv_v):
            def body(i, c):
                kv_k, kv_v, tok = c
                pos = jnp.minimum(P - pad_r + i, 444)
                lg, kvs = wm.decode_step(
                    params, tok, pos, P + i, {"k": kv_k, "v": kv_v},
                    kc_l, vc_l, kv_len=P + i + 1, n_head=H,
                    pad_len=pad_r, compute_dtype=jnp.bfloat16, group=K)
                return kvs["k"], kvs["v"], jnp.argmax(
                    lg, axis=-1).astype(jnp.int32)
            tok0 = jnp.full((R,), 50257, jnp.int32)
            return jax.lax.fori_loop(0, N, body, (kv_k, kv_v, tok0))

        t_steps = timeit(step_loop, (ctx.params, kv_k, kv_v), iters=2)

        # ---- piece 3: per-stream top-k over (S, K*V), 65 chained ---------
        scores0 = jnp.asarray(np.random.RandomState(1).randn(
            R, V).astype(np.float32))

        @jax.jit
        def topk_loop(scores):
            def body(i, sc):
                vals, idx = jax.lax.top_k(sc.reshape(S, K * V), K)
                return sc + vals.mean() * 1e-6
            return jax.lax.fori_loop(0, N, body, scores)

        t_topk = timeit(topk_loop, (scores0,), iters=2)

        pieces = t_gather + t_steps + t_topk
        print(f"  pieces at S={S} ({N} chained steps each):", flush=True)
        print(f"    kv-reorder gather : {t_gather*1e3:8.1f} ms "
              f"({t_gather/N*1e3:6.2f} ms/step)")
        print(f"    decode_step chain : {t_steps*1e3:8.1f} ms "
              f"({t_steps/N*1e3:6.2f} ms/step)")
        print(f"    top_k chain       : {t_topk*1e3:8.1f} ms "
              f"({t_topk/N*1e3:6.2f} ms/step)")
        print(f"    sum {pieces*1e3:.1f} ms vs whole {t_whole*1e3:.1f} ms "
              f"(gap {max(0.0, t_whole-pieces)*1e3:.1f} ms = prompt pass + "
              f"filters + bookkeeping)", flush=True)

    print("\nsummary (30 s windows):")
    for S, (te, tw) in results.items():
        print(f"  S={S:3d}: {S*30/(te+tw):7.1f}x RT per call "
              f"(encode {te*1e3:.0f} ms + decode {tw*1e3:.0f} ms)")


if __name__ == "__main__":
    main()

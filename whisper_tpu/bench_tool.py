"""whisper-bench equivalent (reference: examples/bench/bench.cpp).

Measures the same four metrics the reference publishes in
scripts/bench-all-gg.txt (columns defined at bench.cpp:111-139):

  Enc.  — one full encoder pass (+cross-KV), ms
  Dec.  — single-token decode with full context, ms/token (256 reps)
  Bch5  — 5-sequence batched decode, ms/token (64 reps)
  PP    — 256-token prompt processing, ms/token (16 reps)

Modes: -w 0 full bench (default), -w 1 memcpy, -w 2 mul_mat
(same whisper_bench_memcpy / whisper_bench_ggml_mul_mat split).

Usage: python -m whisper_tpu.bench_tool -m model.bin [-w N]
Without -m, uses random weights at --size dims (default tiny).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .models import whisper as wm
from .models.whisper import WhisperConfig


def _timeit(fn, reps: int) -> float:
    """fn(i) -> computation.  Inputs must differ for every i INCLUDING the
    warmup (the runtime memoizes identical executions), and every result is
    blocked on (unread async results can be elided entirely)."""
    def fence(out):
        # np.asarray of one element is the only reliable completion fence
        # under remote-execution runtimes
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    fence(fn(-1))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = fn(i)
    fence(out)  # calls are data-chained (see callers), one fence suffices
    return (time.perf_counter() - t0) / reps * 1000.0


def bench_full(params, cfg: WhisperConfig, fast: bool = False) -> dict:
    """fast=True cuts every rep count to 2 — for tests exercising the
    plumbing (layouts, jit signatures), not for timing."""
    nh_a, nh_t = cfg.n_audio_head, cfg.n_text_head
    H, Dh, L = cfg.n_text_head, cfg.head_dim_text, cfg.n_text_layer
    r8, r64 = (2, 2) if fast else (8, 64)

    # fresh random data every run: the runtime caches computation results
    # keyed by input values, across processes
    rng = np.random.RandomState()
    mels = [jnp.asarray(rng.rand(
        1, 2 * cfg.n_audio_ctx, cfg.n_mels).astype(np.float32))
        for i in range(9)]

    enc_fn = jax.jit(lambda p, m: wm.cross_kv(
        p, wm.encode(p, m, n_head=nh_a), n_head=nh_t))
    # chain encoder calls through the mel input as well
    enc_state = {"m": mels[0]}

    def enc_step(i):
        kc, vc = enc_fn(params, enc_state["m"])
        delta = jnp.broadcast_to(kc[0, 0, :1, 0, :1] * 1e-6, (1, 1, 1))
        enc_state["m"] = mels[(i + 1) % 8] + delta.reshape(1, 1, 1)
        return kc

    t_enc = _timeit(enc_step, r8)

    kc, vc = enc_fn(params, mels[0])

    def make_dec(B, T_step, n_past):
        C = n_past + T_step + 8
        # lane-tight (L, B, H, Dh, C) cache layout (models/whisper.py
        # decode_step)
        kv = {"k": jnp.zeros((L, B, H, Dh, C), jnp.bfloat16),
              "v": jnp.zeros((L, B, H, Dh, C), jnp.bfloat16)}
        kcb = jnp.broadcast_to(kc, (L, B) + kc.shape[2:])
        vcb = jnp.broadcast_to(vc, (L, B) + vc.shape[2:])
        salt = np.random.randint(0, cfg.n_vocab - 300)
        if T_step == 1:
            pos = jnp.full((B,), n_past, jnp.int32)
            fn = jax.jit(partial(wm.decode_step, n_head=nh_t))
            state = {"tok": jnp.full((B,), salt, jnp.int32)}

            def step(i):
                # chain: next call's token depends on this call's logits,
                # so queued steps must all really execute
                logits, _ = fn(params, state["tok"], pos, jnp.int32(n_past),
                               kv, kcb, vcb, jnp.int32(n_past + 1))
                state["tok"] = jnp.argmax(logits, -1).astype(jnp.int32) % 1000 + i + 2
                return state["tok"]

            return step
        mask = wm.make_causal_mask(T_step)
        fn = jax.jit(partial(wm.decode_prompt, n_head=nh_t))
        state = {"tok": jnp.full((B, T_step), salt, jnp.int32)}

        def step(i):
            logits, _, _ = fn(params, state["tok"], jnp.arange(T_step),
                              kcb, vcb, self_mask=mask)
            state["tok"] = (jnp.argmax(logits, -1).astype(jnp.int32)
                            % 1000 + i + 2)
            return state["tok"]

        return step

    # Dec: 1 token at full context (reference: 256 runs at n_past=n_ctx/2)
    t_dec = _timeit(make_dec(1, 1, cfg.n_text_ctx // 2), r64)
    # Bch5: 5 sequences, 1 token each
    t_bch5 = _timeit(make_dec(5, 1, cfg.n_text_ctx // 2), r64)
    # PP: 256-token prompt
    t_pp = _timeit(make_dec(1, 256, 0), r8) / 256.0
    del kc, vc

    return {"enc_ms": t_enc, "dec_ms": t_dec, "bch5_ms": t_bch5,
            "pp_ms_per_tok": t_pp}


def main(argv=None) -> int:
    from .capi import whisper_bench_memcpy_str, whisper_bench_ggml_mul_mat_str

    ap = argparse.ArgumentParser(prog="whisper-bench")
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("-t", "--threads", type=int, default=4)
    ap.add_argument("-w", "--what", type=int, default=0,
                    help="0=full, 1=memcpy, 2=mul_mat, 3=latency "
                         "(single-stream stream-mode step times)")
    ap.add_argument("--size", default="tiny")
    args = ap.parse_args(argv)

    if args.what == 1:
        print(whisper_bench_memcpy_str(args.threads))
        return 0
    if args.what == 2:
        print(whisper_bench_ggml_mul_mat_str(args.threads))
        return 0
    if args.what == 3:
        # bench.py lives at the repo root (not in the package); make it
        # importable when bench_tool is run from any cwd
        import os
        import sys
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in sys.path:
            sys.path.insert(0, root)
        from bench import bench_latency  # repo-root bench.py
        lat = bench_latency(args.size)
        dev = jax.devices()[0]
        print("| model | device | " +
              " | ".join(k for k in lat) + " |")
        print("| ----- | ------ | " +
              " | ".join("-" * len(k) for k in lat) + " |")
        print(f"| {args.size} | {dev.device_kind} | " +
              " | ".join(f"{v:.1f}" for v in lat.values()) + " |")
        return 0

    if args.model:
        from .api import WhisperContext
        ctx = WhisperContext.from_file(args.model)
        params, cfg = ctx.params, ctx.config
        name = ctx.hparams.model_type
    else:
        from bench import CONFIGS  # repo-root bench.py config table
        from .weights.convert import random_params
        cfg = CONFIGS[args.size]
        params = random_params(cfg, dtype=jnp.bfloat16)
        name = f"{args.size} (random)"

    r = bench_full(params, cfg)
    dev = jax.devices()[0]
    print(f"| model | device | Enc. | Dec. | Bch5 | PP |")
    print(f"| ----- | ------ | ---- | ---- | ---- | -- |")
    print(f"| {name} | {dev.device_kind} | {r['enc_ms']:.2f} | "
          f"{r['dec_ms']:.2f} | {r['bch5_ms']:.2f} | "
          f"{r['pp_ms_per_tok']:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""On-device decode loop vs an independent host-side simulation.

The jitted `decode_window` packs the reference's per-token rules (filter
chain, timestamp state machine, stop conditions) into vectorized lax ops —
subtle to get right.  This test re-implements the same rules in plain
Python (using the numpy filter oracle + jitted single-step model calls) and
asserts the device loop produces EXACTLY the same token sequence and state
on a random-weight model at temperature 0.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import whisper_tpu as wt
from whisper_tpu.constants import CHUNK_SIZE, TICKS_PER_SECOND
from whisper_tpu.decode.filters import FilterConsts, FilterOptions
from whisper_tpu.decode.host_filters import process_logits_host
from whisper_tpu.decode.loop import DELTA_MIN, LoopConfig, make_decode_window
from whisper_tpu.models import whisper as wm
from conftest import make_random_model


def host_simulate(ctx, kc, vc, prompt, seek, seek_end, opts, N,
                  single_segment=False, no_timestamps=False, max_tokens=0):
    """Pure-host re-implementation of the reference token loop
    (greedy t=0), using jitted decode_prompt/decode_step for the math."""
    consts = FilterConsts.from_vocab(ctx.vocab, ctx.hparams.n_audio_ctx)
    v = ctx.vocab
    nh = ctx.config.n_text_head
    P = len(prompt)
    C = P + N + 1
    L, H, Dh = (ctx.config.n_text_layer, ctx.config.n_text_head,
                ctx.config.head_dim_text)

    mask = wm.make_causal_mask(P)
    logits_all, ks, vs = jax.jit(
        lambda p, t, kc, vc: wm.decode_prompt(
            p, t, jnp.arange(P), kc, vc, n_head=nh, self_mask=mask)
    )(ctx.params, jnp.asarray([prompt], jnp.int32), kc, vc)
    raw = np.asarray(logits_all[0, -1])

    kv = {"k": jnp.zeros((L, 1, H, Dh, C), ctx.compute_dtype),
          "v": jnp.zeros((L, 1, H, Dh, C), ctx.compute_dtype)}
    kv["k"] = kv["k"].at[..., :P].set(
        ks.transpose(0, 1, 3, 4, 2).astype(ctx.compute_dtype))
    kv["v"] = kv["v"].at[..., :P].set(
        vs.transpose(0, 1, 3, 4, 2).astype(ctx.compute_dtype))

    step = jax.jit(lambda p, t, pos, ci, kv, kc, vc, kl: wm.decode_step(
        p, t, pos, ci, kv, kc, vc, kv_len=kl, n_head=nh))

    tokens = []
    has_ts, seek_delta, result_len = False, TICKS_PER_SECOND * CHUNK_SIZE, 0
    completed = failed = False
    for i in range(N):
        _, lp, pr = process_logits_host(
            raw, consts, opts, temperature=0.0, tokens_cur=tokens,
            has_ts=has_ts, seek_delta=seek_delta if has_ts else 0)
        tok = int(np.argmax(pr))
        tokens.append(tok)

        # reference state rules (src/whisper.cpp:5990-6065)
        if tok > v.token_beg:
            sdn = 2 * (tok - v.token_beg)
            if has_ts and seek_delta > sdn and result_len < i:
                failed = True
                break
            seek_delta = sdn
            result_len = i + 1
            has_ts = True
        eos = tok == v.token_eot
        if max_tokens > 0 and i >= max_tokens:
            eos = True
        if has_ts and seek + seek_delta + DELTA_MIN >= seek_end:
            eos = True
        if eos:
            if result_len == 0 and not no_timestamps:
                if seek + seek_delta + DELTA_MIN >= seek_end:
                    result_len = i + 1
                else:
                    failed = True
                    break
            if single_segment or no_timestamps:
                result_len = i + 1
                seek_delta = TICKS_PER_SECOND * CHUNK_SIZE
            completed = True
            break
        if i == N - 1 and (result_len == 0
                           or seek_delta < TICKS_PER_SECOND * CHUNK_SIZE // 2):
            failed = True
            break

        lg, kv = step(ctx.params, jnp.asarray([tok], jnp.int32),
                      jnp.asarray([P + i], jnp.int32), jnp.int32(P + i),
                      kv, kc, vc, jnp.int32(P + i + 1))
        raw = np.asarray(lg[0])

    return dict(tokens=tokens, has_ts=has_ts, seek_delta=seek_delta,
                result_len=result_len, completed=completed, failed=failed)


@pytest.mark.parametrize("seed,secs", [(0, 2), (3, 3), (7, 2)])
def test_device_loop_matches_host_simulation(tmp_path, seed, secs):
    path = make_random_model(tmp_path, seed=seed)
    ctx = wt.WhisperContext.from_file(path)
    pcm = (np.random.RandomState(seed + 100)
           .randn(16000 * secs).astype(np.float32) * 0.1)
    ctx.pcm_to_mel(pcm)
    _, kc, vc = ctx.encode_window(0)

    opts = FilterOptions()
    prompt = [ctx.vocab.token_sot]
    N = ctx.hparams.n_text_ctx // 2 - 4
    seek, seek_end = 0, ctx.mel_n_len_org

    expected = host_simulate(ctx, kc, vc, prompt, seek, seek_end, opts, N)

    consts = FilterConsts.from_vocab(ctx.vocab, ctx.hparams.n_audio_ctx)
    cfg = LoopConfig(
        n_head=ctx.config.n_text_head, n_text_ctx=ctx.hparams.n_text_ctx,
        prompt_size=8, max_tokens_loop=N, max_tokens_param=0,
        single_segment=False, no_timestamps=False,
        compute_dtype=ctx.compute_dtype)
    fn = jax.jit(make_decode_window(consts=consts, options=opts, cfg=cfg))

    buf = np.zeros((1, 8), np.int32)
    buf[:, 8 - len(prompt):] = prompt
    out = fn(ctx.params, kc, vc, jnp.asarray(buf),
             jnp.asarray([8 - len(prompt)], np.int32), jnp.float32(0.0),
             jnp.int32(seek), jnp.int32(seek_end), jax.random.PRNGKey(0))
    out = jax.tree_util.tree_map(np.asarray, out)

    n = int(out["n_tokens"])
    got_tokens = out["tokens"][0][:n].tolist()

    assert got_tokens == expected["tokens"], (
        f"device {got_tokens} != host {expected['tokens']}")
    assert bool(out["completed"][0]) == expected["completed"]
    assert bool(out["failed"][0]) == expected["failed"]
    assert int(out["result_len"][0]) == expected["result_len"]
    assert int(out["seek_delta"][0]) == expected["seek_delta"]
    assert bool(out["has_ts"][0]) == expected["has_ts"]

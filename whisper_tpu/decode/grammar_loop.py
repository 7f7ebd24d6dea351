"""Host-grammar decode paths: batched multi-decoder + device-chunked.

The reference runs GBNF grammar inside its up-to-8-decoder batch at every
ladder temperature (reference: src/whisper.cpp:5718-5724, 5925-5977) and
round-trips the device once per token (:2960-2966).  This module replaces
the old one-decoder-one-token compat loop with two TPU-shaped paths:

1. `decode_window_grammar` with n_decoders > 1 — one jitted device step
   per token for ALL decoders at once (lockstep positions, per-decoder
   grammar pushdown state, per-decoder multinomial draws).  Restores the
   reference's best_of retry diversity at t > 0 which the round-2 path
   collapsed to a single decoder.

2. The same function at n_decoders == 1 and t == 0 switches to
   SPECULATIVE CHUNKING: the device decodes K tokens per host sync using
   the jitted filter chain WITHOUT grammar, returning the K sampled
   tokens and their raw logits; the host replays each position through
   the exact reference filter chain INCLUDING grammar suppression and
   accepts the longest matching prefix.  On a mismatch the host's choice
   wins, the device is restarted from the corrected token (stale KV
   entries beyond kv_len are masked, so a restart is one step_fn call),
   and chunking resumes.  Host semantics are bit-identical to the
   one-token loop — the device tokens are only a guess — while device
   round-trips drop ~K-fold whenever the grammar agrees with the
   unconstrained argmax (the common case: grammar only bends the
   distribution when the model drifts off-grammar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CHUNK_SIZE, TICKS_PER_SECOND
from .filters import FilterConsts, FilterOptions, make_process_logits
from .host_filters import process_logits_host
from .loop import DELTA_MIN

SPEC_CHUNK = 8   # device tokens per host grammar sync (speculative path)


def _make_chunk_fn(ctx, consts: FilterConsts, opts: FilterOptions, K: int,
                   extra_suppress: tuple = ()):
    """Jitted up-to-K-step speculative decoder (B=1, greedy).

    A `lax.while_loop` that samples through the jitted filter chain
    (WITHOUT grammar) and stops EARLY when the device itself would stop —
    end-of-text or window end — so short segments cost the same device
    steps as the one-token loop.  Carries the filter-chain state (ts
    pairing flags, has_ts, seek_delta) the same way decode/loop.py does;
    failure/eos bookkeeping stays on the host, which is the oracle.
    Returns (tokens (K,), raw logits (K, V), n sampled, stopped, raw_next,
    kv): the host replays the first `n` positions through the exact
    reference chain including grammar.
    """
    from ..models import whisper as wm

    nh = ctx.config.n_text_head
    cd = ctx.compute_dtype
    V = ctx.hparams.n_vocab
    # suppress_regex ids are static per window, so the device chain can
    # apply them at EVERY chunk step — otherwise a regex that suppresses
    # the unconstrained argmax would mismatch the host at position 0 of
    # every chunk, degrading speculation to 2 device calls per token
    process = make_process_logits(consts, opts, extra_suppress)
    beg = consts.token_beg
    eot = consts.token_eot

    @jax.jit
    def chunk_fn(params, raw, kv, kc, vc, ci0, i0, last_was_ts,
                 penult_was_ts, has_ts, seek_delta, is_initial, seek,
                 seek_end, i_stop, mask0, k_max):
        """mask0: (V,) additive grammar penalty for the FIRST position —
        the host knows the current pushdown state, so chunk token 0 is
        grammar-aware and never mismatches on grammar grounds.  k_max:
        traced chunk length (<= K) — the host adapts it to the recent
        mismatch rate without recompiling."""
        toks0 = jnp.zeros((K,), jnp.int32)
        raws0 = jnp.zeros((K, V), jnp.float32)

        def cond(c):
            t, stop = c[0], c[1]
            return (t < k_max) & ~stop

        def body(c):
            (t, _stop, raw, kv_k, kv_v, li, pi, hi, sd, init,
             toks, raws) = c
            lg, _, _ = process(raw, jnp.float32(0.0), init, li, pi, hi, sd)
            lg = jnp.where(t == 0, lg + mask0[None, :], lg)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)   # (1,)
            toks = toks.at[t].set(tok[0])
            raws = raws.at[t].set(raw[0])

            # filter-state update (mirrors loop.py token_state_update's
            # apply_ts part; divergence costs a restart, never correctness)
            is_ts_update = tok > beg
            sdn = 2 * (tok - beg)
            goes_back = hi & (sd > sdn)
            apply_ts = is_ts_update & ~goes_back
            sd = jnp.where(apply_ts, sdn, sd)
            hi = hi | apply_ts
            li_next = tok >= beg
            pi_next = li

            # device-side stop prediction (host re-derives the real one)
            stop = (tok[0] == eot) | (i0 + t >= i_stop) \
                | (hi[0] & (seek + sd[0] + DELTA_MIN >= seek_end))

            def do_step(_):
                lg_raw, kv2 = wm.decode_step(
                    params, tok, jnp.full((1,), ci0 + t, jnp.int32),
                    ci0 + t, {"k": kv_k, "v": kv_v}, kc, vc,
                    kv_len=ci0 + t + 1, n_head=nh, compute_dtype=cd)
                return lg_raw, kv2["k"], kv2["v"]

            def skip(_):
                return raw, kv_k, kv_v

            raw2, kv_k2, kv_v2 = jax.lax.cond(
                ~stop, do_step, skip, None)
            return (t + 1, stop, raw2, kv_k2, kv_v2, li_next, pi_next,
                    hi, sd, jnp.zeros_like(init), toks, raws)

        init_c = (jnp.int32(0), jnp.bool_(False), raw, kv["k"], kv["v"],
                  last_was_ts, penult_was_ts, has_ts, seek_delta,
                  is_initial, toks0, raws0)
        out = jax.lax.while_loop(cond, body, init_c)
        (t, stop, raw_next, kv_k, kv_v) = out[0], out[1], out[2], out[3], out[4]
        toks, raws = out[10], out[11]
        # ONE packed result array -> ONE host fetch per chunk (the
        # tunneled-TPU round trip is ~30 ms; separate fetches for
        # toks/count/stop/raws would each pay it).  Token ids < 2^24
        # are exact in f32.
        packed = jnp.concatenate([
            jnp.asarray([t, stop.astype(jnp.int32)], jnp.float32),
            toks.astype(jnp.float32), raws.reshape(-1)])
        return packed, raw_next, {"k": kv_k, "v": kv_v}

    return chunk_fn


def decode_window_grammar(ctx, prompt, kc, vc, t_cur, seek, seek_end,
                          params, opts, no_timestamps, grammar=None,
                          n_decoders: int = 1, seed: int = 0):
    """Window decode with host-side grammar / logits-filter semantics.

    Same result contract as the jitted loop (dict of (B, N) arrays), with
    B = n_decoders rows.  Rule order and state machine match the
    reference exactly (src/whisper.cpp:5015-5283 filters, :5990-6065
    per-token state update).
    """
    B = max(1, int(n_decoders))
    consts = FilterConsts.from_vocab(ctx.vocab, ctx.hparams.n_audio_ctx)
    prompt_fn, step_fn = ctx._prompt_step_fns()
    N = ctx.hparams.n_text_ctx // 2 - 4
    P = len(prompt)
    C = P + N + 1
    L, H, Dh = (ctx.config.n_text_layer, ctx.config.n_text_head,
                ctx.config.head_dim_text)
    vocab = ctx.vocab
    beg = vocab.token_beg
    eot = vocab.token_eot

    prompt_b = jnp.tile(jnp.asarray([prompt], jnp.int32), (B, 1))
    kc_b, vc_b = kc, vc
    if B > 1 and hasattr(kc, "shape") and kc.shape[1] == 1:
        kc_b = jnp.tile(kc, (1, B, 1, 1, 1))
        vc_b = jnp.tile(vc, (1, B, 1, 1, 1))

    logits0, ks, vs = prompt_fn(ctx.params, prompt_b, kc_b, vc_b)
    raw0 = np.asarray(logits0[:, -1], np.float32)           # (B, V)
    lp0 = np.exp(raw0[0] - raw0[0].max())
    no_speech_prob = float((lp0 / lp0.sum())[vocab.token_nosp])

    kv = {"k": jnp.zeros((L, B, H, Dh, C), ctx.compute_dtype),
          "v": jnp.zeros((L, B, H, Dh, C), ctx.compute_dtype)}
    kv["k"] = kv["k"].at[..., :P].set(
        ks.transpose(0, 1, 3, 4, 2).astype(ctx.compute_dtype))
    kv["v"] = kv["v"].at[..., :P].set(
        vs.transpose(0, 1, 3, 4, 2).astype(ctx.compute_dtype))

    rng = np.random.RandomState(seed)

    # load the vocab tables into the ORIGINAL grammar engine once so every
    # per-decoder/per-window copy() inherits them (the native clone copies
    # the C++ tables; re-loading per window cost more than the decode)
    if grammar is not None and hasattr(grammar, "_ensure_vocab"):
        grammar._ensure_vocab(vocab)

    # per-decoder host state (reference keeps one whisper_decoder each,
    # whisper.cpp:5733-5755)
    toks = [[] for _ in range(B)]
    p_a = [[] for _ in range(B)]
    plog_a = [[] for _ in range(B)]
    tid_a = [[] for _ in range(B)]
    pt_a = [[] for _ in range(B)]
    ptsum_a = [[] for _ in range(B)]
    grams = [grammar.copy() if grammar is not None else None
             for _ in range(B)]
    has_ts = [False] * B
    seek_delta = [TICKS_PER_SECOND * CHUNK_SIZE] * B
    result_len = [0] * B
    completed = [False] * B
    failed = [False] * B
    sum_lp = [0.0] * B
    raw = raw0                                   # (B, V) raw logits
    last_tok = [eot] * B

    def host_choose(b, i, raw_b):
        """Exact reference filter chain + sampler for decoder b at step i.
        Returns (tok, p, plog, tid, pt, ptsum)."""
        lg, lp, pr = process_logits_host(
            raw_b, consts, opts, temperature=t_cur, tokens_cur=toks[b],
            has_ts=has_ts[b], seek_delta=seek_delta[b] if has_ts[b] else 0,
            grammar=grams[b], vocab=vocab,
            grammar_penalty=params.grammar_penalty,
            suppress_regex=params.suppress_regex,
            logits_filter_callback=params.logits_filter_callback)
        if t_cur < 1e-6:
            tok = int(np.argmax(pr))
        else:
            tok = int(rng.choice(len(pr), p=pr / pr.sum()))
        ts_probs = pr[beg:]
        ptsum = float(ts_probs.sum())
        tid = int(np.argmax(ts_probs)) + beg
        pt = float(ts_probs.max() / (ptsum + 1e-10))
        if tok >= beg:
            tid, pt = tok, float(pr[tok])
        return tok, float(pr[tok]), float(lp[tok]), tid, pt, ptsum

    def accept(b, i, choice):
        """Record token + run the reference per-token state update
        (src/whisper.cpp:5990-6065).  Returns True while decoder b
        continues."""
        tok, p, plog, tid, pt, ptsum = choice
        toks[b].append(tok)
        p_a[b].append(p)
        plog_a[b].append(plog)
        tid_a[b].append(tid)
        pt_a[b].append(pt)
        ptsum_a[b].append(ptsum)
        sum_lp[b] += plog
        last_tok[b] = tok
        if grams[b] is not None:
            grams[b].accept_token(vocab, tok)

        if tok > beg:
            sdn = 2 * (tok - beg)
            if has_ts[b] and seek_delta[b] > sdn and result_len[b] < i:
                failed[b] = True
                return False
            seek_delta[b] = sdn
            result_len[b] = i + 1
            has_ts[b] = True
        eos = tok == eot
        if params.max_tokens > 0 and i >= params.max_tokens:
            eos = True
        if has_ts[b] and seek + seek_delta[b] + DELTA_MIN >= seek_end:
            eos = True
        if eos:
            if result_len[b] == 0 and not no_timestamps:
                if seek + seek_delta[b] + DELTA_MIN >= seek_end:
                    result_len[b] = i + 1
                else:
                    failed[b] = True
                    return False
            if params.single_segment or no_timestamps:
                result_len[b] = i + 1
                seek_delta[b] = TICKS_PER_SECOND * CHUNK_SIZE
            completed[b] = True
            return False
        if i == N - 1 and (result_len[b] == 0
                           or seek_delta[b]
                           < TICKS_PER_SECOND * CHUNK_SIZE // 2):
            failed[b] = True
            return False
        return True

    # ---- speculative chunked path (B=1, greedy, no user callback) --------
    speculative = (B == 1 and t_cur < 1e-6
                   and params.logits_filter_callback is None
                   and grammar is not None)
    if speculative:
        extra = (ctx._regex_suppress_ids(params.suppress_regex)
                 if params.suppress_regex else ())
        key = ("gchunk", opts, SPEC_CHUNK, extra)
        if key not in ctx._jit_cache:
            ctx._jit_cache[key] = _make_chunk_fn(ctx, consts, opts,
                                                 SPEC_CHUNK, extra)
        chunk_fn = ctx._jit_cache[key]
        i_stop = params.max_tokens if params.max_tokens > 0 else 1 << 30

        i = 0
        # adaptive: x2 on clean chunks, reset on miss; always <= the
        # traced chunk capacity (a SPEC_CHUNK=1 build must never ask the
        # device for 2 steps — the packed result only has K rows)
        cur_k = min(2, SPEC_CHUNK)
        need_step = False   # device must be resumed with last_tok[0]
        # `raw` stays a DEVICE array end to end: the host validates from
        # the craws rows inside each packed result, so the only host
        # round trip per chunk is the packed fetch itself
        raw = jnp.asarray(raw)
        while i < N:
            if need_step:
                # resume from the last ACCEPTED token: its KV slot is
                # (re)written; stale later entries sit beyond kv_len and
                # are masked out.  No host fetch — raw feeds the next
                # chunk directly.
                pos = P + i - 1
                raw, kv = step_fn(
                    ctx.params, jnp.asarray([last_tok[0]], jnp.int32),
                    jnp.asarray([pos], jnp.int32), jnp.int32(pos),
                    kv, kc_b, vc_b, jnp.int32(pos + 1))
                ctx.timings.n_decode += 1
                need_step = False

            # filter-chain state snapshot for the device (same
            # derivation as host_filters.py:83-84)
            lts = len(toks[0]) > 0 and toks[0][-1] >= beg
            pts = len(toks[0]) < 2 or toks[0][-2] >= beg
            mask0 = np.zeros((raw.shape[-1],), np.float32)
            grams[0].suppress_invalid(vocab, mask0,
                                      params.grammar_penalty)
            packed, raw_next, kv = chunk_fn(
                ctx.params, raw, kv, kc_b, vc_b,
                jnp.int32(P + i), jnp.int32(i),
                jnp.asarray([lts]), jnp.asarray([pts]),
                jnp.asarray([has_ts[0]]),
                jnp.asarray([seek_delta[0]
                             if has_ts[0] else 0], jnp.int32),
                jnp.asarray([len(toks[0]) == 0]),
                jnp.int32(seek), jnp.int32(seek_end),
                jnp.int32(i_stop), jnp.asarray(mask0),
                jnp.int32(min(cur_k, N - i)))
            packed = np.asarray(packed)     # the single host round trip
            n_dev = int(packed[0])
            dev_stop = bool(packed[1])
            ctoks = packed[2:2 + SPEC_CHUNK].astype(np.int32)
            craws = packed[2 + SPEC_CHUNK:].reshape(SPEC_CHUNK, -1)
            # device performed n_dev - 1 steps when it stopped early
            ctx.timings.n_decode += n_dev - (1 if dev_stop else 0)

            stopped = False
            mismatched = False
            for j in range(n_dev):
                choice = host_choose(0, i + j, craws[j])
                cont = accept(0, i + j, choice)
                if not cont:
                    stopped = True
                    i += j + 1
                    break
                if choice[0] != int(ctoks[j]):
                    mismatched = True
                    i += j + 1
                    break
            else:
                i += n_dev
            if stopped:
                break
            if mismatched:
                cur_k = min(2, SPEC_CHUNK)
                need_step = True
            elif dev_stop:
                need_step = True
            else:
                cur_k = min(SPEC_CHUNK, cur_k * 2)
                raw = raw_next
    else:
        # ---- batched one-token-per-sync path (reference-shaped) ----------
        for i in range(N):
            for b in range(B):
                if completed[b] or failed[b]:
                    continue
                choice = host_choose(b, i, raw[b])
                accept(b, i, choice)
            if all(c or f for c, f in zip(completed, failed)):
                break
            if i == N - 1:
                break
            feed = jnp.asarray([last_tok[b] for b in range(B)], jnp.int32)
            lg_next, kv = step_fn(
                ctx.params, feed,
                jnp.full((B,), P + i, jnp.int32), jnp.int32(P + i),
                kv, kc_b, vc_b, jnp.int32(P + i + 1))
            raw = np.asarray(lg_next, np.float32)
            ctx.timings.n_decode += 1

    def pad_rows(rows, fill, dtype):
        return np.asarray([r + [fill] * (N - len(r)) for r in rows], dtype)

    return {
        # EOT padding matches the device loop's EOT-initialized buffer —
        # api._own_sampled_len strips trailing EOTs to recover a failed
        # row's own length inside the batch-global step budget
        "tokens": pad_rows(toks, eot, np.int32),
        "p": pad_rows(p_a, 0.0, np.float32),
        "plog": pad_rows(plog_a, 0.0, np.float32),
        "tid": pad_rows(tid_a, 0, np.int32),
        "pt": pad_rows(pt_a, 0.0, np.float32),
        "ptsum": pad_rows(ptsum_a, 0.0, np.float32),
        "n_tokens": np.int32(max(len(r) for r in toks)),
        "has_ts": np.asarray(has_ts),
        "seek_delta": np.asarray(seek_delta, np.int32),
        "result_len": np.asarray(result_len, np.int32),
        "sum_logprobs_all": np.asarray(sum_lp, np.float32),
        "completed": np.asarray(completed),
        "failed": np.asarray(failed),
        "no_speech_prob": np.full((B,), no_speech_prob, np.float32),
    }

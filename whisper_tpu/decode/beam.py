"""On-device beam search.

The reference's beam search (reference: src/whisper.cpp:5885-5977) keeps up
to `beam_size` decoder slots sharing one KV cache with per-sequence cell
tags, draws candidates per live decoder, sorts them globally by cumulative
logprob (`sum_logprobs_all`), dedupes identical sequences, and shuffles KV
cells between slots.

TPU-native redesign: beams are a dense leading axis of every tensor.  Each
step scores all `beam * vocab` continuations, takes a global top-k over the
LIVE beams, and reorders the KV cache with one gather on the beam axis —
no cell bookkeeping.  Finished beams are frozen in place: they keep their
slot, contribute no candidates, and live slots are filled rank-order from
the global top-k (the same slot-filling the reference's cur_c loop does).

Candidate selection follows the reference's temperature split
(src/whisper.cpp:5357-5430): at t == 0 candidates are the top-k by
logprob; at t > 0 each expanding beam DRAWS beam_size candidates
multinomially (the reference's std::discrete_distribution), duplicates
collapse (same (beam, token) draw scores once), and the global top-k runs
over the drawn set only.  One deliberate deviation remains: the draws use
JAX's counter-based PRNG, so exact candidate ids differ from any libstdc++
stream — distributional parity, not bit parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CHUNK_SIZE, TICKS_PER_SECOND
from .filters import FilterConsts, FilterOptions, make_process_logits, sample_token_data
from .loop import LoopConfig, token_state_update
from ..models import whisper as wm

NEG_INF = float("-inf")


def make_beam_decode_window(*, consts: FilterConsts, options: FilterOptions,
                            cfg: LoopConfig, beam_size: int,
                            extra_suppress: tuple = (), mesh=None):
    """Build the jitted beam-search window decoder (B = beam_size).

    mesh: optional jax.sharding.Mesh — pins the self-attention KV cache to
    the shared (None, data, "model", None, None) layout so the while carry
    stays beam-sharded/head-sharded under pjit (same role as the greedy
    loop's constraint; beam-reorder gathers over the data axis become XLA
    collectives)."""
    process_logits = make_process_logits(consts, options, extra_suppress)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from ..parallel.mesh import kv_spec
        _kv_sh = NamedSharding(mesh, kv_spec(mesh))

        def constrain_kv(x):
            return jax.lax.with_sharding_constraint(x, _kv_sh)
    else:
        def constrain_kv(x):
            return x
    P = cfg.prompt_size
    N = cfg.max_tokens_loop
    B = beam_size
    V = consts.n_vocab
    token_beg = consts.token_beg

    def decode_window(params, k_cross, v_cross, prompt, pad_len,
                      temperature, seek, seek_end, rng_key):
        L = k_cross.shape[0]
        H = cfg.n_head
        Dh = k_cross.shape[3]          # (L, B, H, Dh, Ta)
        C = P + N + 1

        idx = jnp.arange(P)
        positions = jnp.maximum(idx[None, :] - pad_len[:, None], 0)
        q = idx[None, :, None]
        k = idx[None, None, :]
        # pad queries must keep at least one valid key (themselves):
        # a fully-masked softmax row is NaN and the NaN would poison later
        # layers' K/V for the real positions
        valid = (k <= q) & ((k >= pad_len[:, None, None]) | (k == q))
        mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None]

        logits_all, k_self, v_self = wm.decode_prompt(
            params, prompt, positions, k_cross, v_cross, cfg.n_head,
            self_mask=mask, compute_dtype=cfg.compute_dtype)
        logits0 = logits_all[:, -1]

        no_speech_prob = jax.nn.softmax(logits0, axis=-1)[:, consts.token_nosp]

        # cache layout (L, B, H, Dh, C): lane-tight like cross_kv
        kv_k = jnp.zeros((L, B, H, Dh, C), cfg.compute_dtype)
        kv_v = jnp.zeros((L, B, H, Dh, C), cfg.compute_dtype)
        kv_k = constrain_kv(kv_k.at[..., :P].set(
            k_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)))
        kv_v = constrain_kv(kv_v.at[..., :P].set(
            v_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)))

        false_b = jnp.zeros((B,), bool)
        _, lp, pr = process_logits(
            logits0, temperature,
            is_initial=jnp.ones((B,), bool),
            last_was_ts=false_b, penult_was_ts=jnp.ones((B,), bool),
            has_ts=false_b, seek_delta=jnp.zeros((B,), jnp.int32))

        state = dict(
            i=jnp.int32(0), kv_k=kv_k, kv_v=kv_v,
            logprobs=lp, probs=pr,
            tokens=jnp.full((B, N), consts.token_eot, jnp.int32),
            p=jnp.zeros((B, N)), plog=jnp.zeros((B, N)),
            tid=jnp.zeros((B, N), jnp.int32),
            pt=jnp.zeros((B, N)), ptsum=jnp.zeros((B, N)),
            # True so the i=0 penultimate flag (size < 2) is correct
            last_was_ts=jnp.ones((B,), bool),
            penult_was_ts=jnp.ones((B,), bool),
            has_ts=false_b,
            seek_delta=jnp.full((B,), TICKS_PER_SECOND * CHUNK_SIZE, jnp.int32),
            result_len=jnp.zeros((B,), jnp.int32),
            cum=jnp.zeros((B,)),           # sum_logprobs_all
            completed=false_b, failed=false_b,
            # at step 0 every beam is an identical copy: only row 0 expands
            live_mask_init=jnp.arange(B) == 0,
            rng=rng_key,
        )

        def cond(s):
            return (s["i"] < N) & ~jnp.all(s["completed"] | s["failed"])

        def body(s):
            i = s["i"]
            live = ~(s["completed"] | s["failed"])
            expand = live & jnp.where(i == 0, s["live_mask_init"], True)

            # ---- candidate scores over (B, V) ---------------------------
            scores = s["cum"][:, None] + s["logprobs"]
            scores = jnp.where(expand[:, None], scores, NEG_INF)

            # t > 0: each expanding beam draws B multinomial candidates
            # (reference: whisper.cpp:5357-5430); only drawn (beam, token)
            # cells keep their score, so duplicates collapse and the global
            # top-k picks among the drawn set.  t == 0: deterministic top-k
            # — gated by lax.cond so the (B, B, V) threefry draw is SKIPPED
            # entirely at t == 0 (it was discarded by the select anyway;
            # rung keys are fresh per call, so not advancing rng at t == 0
            # cannot affect any t > 0 rung)
            def _deterministic(_):
                return scores, s["rng"]

            def _multinomial(_):
                rng2, sub = jax.random.split(s["rng"])
                drawn = jax.random.categorical(
                    sub, s["logprobs"], axis=-1,
                    shape=(B, B)).T                           # (B beams, B)
                drawn_mask = jnp.zeros((B, V), bool).at[
                    jnp.arange(B)[:, None], drawn].set(True)
                return jnp.where(drawn_mask, scores, NEG_INF), rng2

            scores, rng = jax.lax.cond(
                temperature < 1e-6, _deterministic, _multinomial, None)

            flat = scores.reshape(-1)
            top_vals, top_idx = jax.lax.top_k(flat, B)
            parent = (top_idx // V).astype(jnp.int32)
            tok_cand = (top_idx % V).astype(jnp.int32)

            # assign candidates to live slots rank-order: the r-th live slot
            # (by slot index) takes the r-th best candidate
            slot_rank = jnp.cumsum(live.astype(jnp.int32)) - 1   # (B,)
            slot_rank = jnp.clip(slot_rank, 0, B - 1)
            parent_b = jnp.where(live, parent[slot_rank], jnp.arange(B))
            tok = jnp.where(live, tok_cand[slot_rank], s["tokens"][:, jnp.maximum(i - 1, 0)])
            new_cum = jnp.where(live, top_vals[slot_rank], s["cum"])

            # ---- gather parent state for live slots ---------------------
            # parent_b falls back to the identity index for non-live rows,
            # so a plain gather IS the select — no post-gather where (which
            # would read both copies and cost ~1.5x the traffic on the KV)
            def g(x):
                return x[parent_b]

            tokens = g(s["tokens"])
            p_arr = g(s["p"]); plog_arr = g(s["plog"])
            tid_arr = g(s["tid"]); pt_arr = g(s["pt"]); ptsum_arr = g(s["ptsum"])
            has_ts = s["has_ts"][parent_b]
            seek_delta = s["seek_delta"][parent_b]
            result_len = s["result_len"][parent_b]
            last_was_ts_p = s["last_was_ts"][parent_b]
            probs_g = s["probs"][parent_b]
            logprobs_g = s["logprobs"][parent_b]

            # KV reorder: one gather on the beam axis (a collective over
            # the data axis when the mesh shards beams)
            kv_k = constrain_kv(s["kv_k"][:, parent_b])
            kv_v = constrain_kv(s["kv_v"][:, parent_b])

            # ---- record token + metadata --------------------------------
            b = jnp.arange(B)
            p_tok = probs_g[b, tok]
            plog_tok = logprobs_g[b, tok]
            tid, pt, ptsum = sample_token_data(probs_g, logprobs_g, consts)
            is_ts = tok >= token_beg
            tid = jnp.where(is_ts, tok, tid).astype(jnp.int32)
            pt = jnp.where(is_ts, p_tok, pt)

            tokens = tokens.at[:, i].set(jnp.where(live, tok, tokens[:, i]))
            p_arr = p_arr.at[:, i].set(jnp.where(live, p_tok, 0.0))
            plog_arr = plog_arr.at[:, i].set(jnp.where(live, plog_tok, 0.0))
            tid_arr = tid_arr.at[:, i].set(jnp.where(live, tid, 0))
            pt_arr = pt_arr.at[:, i].set(jnp.where(live, pt, 0.0))
            ptsum_arr = ptsum_arr.at[:, i].set(jnp.where(live, ptsum, 0.0))

            # ---- shared per-token state rules ---------------------------
            has_ts, seek_delta, result_len, completed, failed = \
                token_state_update(
                    consts, cfg, i=i, tok=tok, live=live, has_ts=has_ts,
                    seek_delta=seek_delta, result_len=result_len,
                    completed=s["completed"], failed=s["failed"],
                    seek=seek, seek_end=seek_end, N=N)

            # ---- next logits --------------------------------------------
            def do_decode(_):
                pos_ids = jnp.minimum(P - pad_len + i, cfg.n_text_ctx - 1)
                lg_raw, kv = wm.decode_step(
                    params, tok, pos_ids, P + i,
                    {"k": kv_k, "v": kv_v}, k_cross, v_cross,
                    kv_len=P + i + 1, n_head=cfg.n_head, pad_len=pad_len,
                    compute_dtype=cfg.compute_dtype)
                return lg_raw, kv["k"], kv["v"]

            def skip(_):
                return logprobs_g, kv_k, kv_v

            any_live = ~jnp.all(completed | failed)
            lg_raw, kv_k, kv_v = jax.lax.cond(
                any_live & (i + 1 < N), do_decode, skip, None)

            last_was_ts = jnp.where(live, tok >= token_beg, s["last_was_ts"])
            penult_was_ts = jnp.where(live, last_was_ts_p, s["penult_was_ts"])

            _, lp, pr = process_logits(
                lg_raw, temperature,
                is_initial=jnp.zeros_like(live),
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta)

            return dict(
                i=i + 1, kv_k=kv_k, kv_v=kv_v, logprobs=lp, probs=pr,
                tokens=tokens, p=p_arr, plog=plog_arr, tid=tid_arr,
                pt=pt_arr, ptsum=ptsum_arr,
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
                cum=new_cum, completed=completed, failed=failed,
                live_mask_init=s["live_mask_init"], rng=rng)

        final = jax.lax.while_loop(cond, body, state)

        return {
            "tokens": final["tokens"],
            "p": final["p"], "plog": final["plog"],
            "tid": final["tid"], "pt": final["pt"], "ptsum": final["ptsum"],
            "n_tokens": final["i"],
            "has_ts": final["has_ts"],
            "seek_delta": final["seek_delta"],
            "result_len": final["result_len"],
            "sum_logprobs_all": final["cum"],
            "completed": final["completed"],
            "failed": final["failed"],
            "no_speech_prob": no_speech_prob,
        }

    return decode_window


def make_batched_beam_decode_window(*, consts: FilterConsts,
                                    options: FilterOptions, cfg: LoopConfig,
                                    n_streams: int, beam_size: int,
                                    extra_suppress: tuple = ()):
    """S independent streams x K beams in ONE jitted device batch — the
    serving-path form of beam search (round-4: beam-5 requests ride the
    device batch instead of dropping to the serial per-window path).

    Geometry: every per-beam tensor has a dense row axis of R = S*K rows,
    row s*K + k = beam k of stream s.  The step is the single-stream
    algorithm applied per stream: scores reshape to (S, K*V), a
    PER-STREAM top-k picks K continuations, and the KV reorder stays ONE
    gather on the row axis with globalized parent ids.  Cross-attention
    K/V keep S rows — the K beams of a stream SHARE their encoder output
    by riding the query-position axis of the same einsum
    (models/whisper.decode_step group=K), so nothing is tiled in HBM.

    Per-stream draw keys (rng (S, 2) uint32, api.window_rng(seek, attempt,
    per_row=False) per stream) make each stream's candidate draws
    independent of batch composition: at S=1 this function reproduces
    make_beam_decode_window bit-for-bit, so batch == serial parity holds
    for beam search exactly as it does for the greedy ladder.

    Inputs are PER-STREAM rows: prompt (S, P), pad_len/seeks/ends (S,),
    row_live (S,) (dead slots let partial batches reuse the compiled fn).
    Outputs are per-row (R, ...) with no_speech_prob tiled to rows, so the
    host ranks stream s over rows [s*K, (s+1)*K)
    (api._rank_window_candidates row0=s*K), identical to the serial beam.

    Reference semantics carried over: candidate split by temperature
    (whisper.cpp:5357-5430), KV shuffle between slots (:5925-5977),
    best_of slots at t>0 (:5718-5724).
    """
    process_logits = make_process_logits(consts, options, extra_suppress)
    P = cfg.prompt_size
    N = cfg.max_tokens_loop
    S, K = n_streams, beam_size
    R = S * K
    V = consts.n_vocab
    token_beg = consts.token_beg

    def decode_window(params, k_cross, v_cross, prompt, pad_len,
                      temperature, seeks, ends, rng_keys, row_live=None):
        prequant = not hasattr(k_cross, "shape")   # (codes, scales) pair
        if prequant:
            assert cfg.cross_mode in ("einsum_q8", "einsum_q8i",
                                      "einsum_q4"), \
                f"batched beam needs an einsum cross_mode for grouped " \
                f"queries, got {cfg.cross_mode}"
            kq_shape = k_cross[0].shape
            L, Dh = kq_shape[0], kq_shape[3]
            if cfg.cross_mode == "einsum_q4":
                Dh *= 2
        else:
            L, Dh = k_cross.shape[0], k_cross.shape[3]   # (L, S, H, Dh, Ta)
        H = cfg.n_head
        C = P + N + 1

        # ---- prompt pass at S rows (beams of a stream share it) ----------
        idx = jnp.arange(P)
        positions = jnp.maximum(idx[None, :] - pad_len[:, None], 0)
        q = idx[None, :, None]
        k = idx[None, None, :]
        valid = (k <= q) & ((k >= pad_len[:, None, None]) | (k == q))
        mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None]

        if prequant:
            ptag = "q4" if cfg.cross_mode == "einsum_q4" else "q8"
            kc_p = (ptag,) + tuple(k_cross)
            vc_p = (ptag,) + tuple(v_cross)
        else:
            kc_p, vc_p = k_cross, v_cross
        logits_all, k_self, v_self = wm.decode_prompt(
            params, prompt, positions, kc_p, vc_p, cfg.n_head,
            self_mask=mask, compute_dtype=cfg.compute_dtype)
        logits0 = logits_all[:, -1]                              # (S, V)
        no_speech_prob = jax.nn.softmax(
            logits0, axis=-1)[:, consts.token_nosp]              # (S,)

        # cross-KV layout for the token loop (einsum paths only — grouped
        # queries need the "bqhd,bhdt" contraction)
        if cfg.cross_mode in ("einsum_q8", "einsum_q8i", "einsum_q4"):
            tag = {"einsum_q8": "q8e", "einsum_q8i": "q8i",
                   "einsum_q4": "q4e"}[cfg.cross_mode]
            if prequant:
                kc_loop = (tag,) + tuple(k_cross)
                vc_loop = (tag,) + tuple(v_cross)
            else:
                from ..ops.cross_attention import (quantize_kv_bhdt,
                                                   quantize_kv_bhdt_q4)
                qfn = (quantize_kv_bhdt_q4 if tag == "q4e"
                       else quantize_kv_bhdt)
                kq, ks = qfn(k_cross)
                vq, vs = qfn(v_cross)
                kc_loop = (tag, kq, ks)
                vc_loop = (tag, vq, vs)
        else:
            kc_loop, vc_loop = k_cross, v_cross

        # ---- tile per-stream state to R rows ------------------------------
        kv_k = jnp.zeros((L, R, H, Dh, C), cfg.compute_dtype)
        kv_v = jnp.zeros((L, R, H, Dh, C), cfg.compute_dtype)
        kv_k = kv_k.at[..., :P].set(jnp.repeat(
            k_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype),
            K, axis=1))
        kv_v = kv_v.at[..., :P].set(jnp.repeat(
            v_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype),
            K, axis=1))
        pad_len_r = jnp.repeat(pad_len, K)
        seeks_r = jnp.repeat(seeks, K)
        ends_r = jnp.repeat(ends, K)

        false_r = jnp.zeros((R,), bool)
        dead_r = (false_r if row_live is None
                  else jnp.repeat(~row_live, K))
        _, lp, pr = process_logits(
            jnp.repeat(logits0, K, axis=0), temperature,
            is_initial=jnp.ones((R,), bool),
            last_was_ts=false_r, penult_was_ts=jnp.ones((R,), bool),
            has_ts=false_r, seek_delta=jnp.zeros((R,), jnp.int32))

        state = dict(
            i=jnp.int32(0), kv_k=kv_k, kv_v=kv_v,
            logprobs=lp, probs=pr,
            tokens=jnp.full((R, N), consts.token_eot, jnp.int32),
            p=jnp.zeros((R, N)), plog=jnp.zeros((R, N)),
            tid=jnp.zeros((R, N), jnp.int32),
            pt=jnp.zeros((R, N)), ptsum=jnp.zeros((R, N)),
            last_was_ts=jnp.ones((R,), bool),
            penult_was_ts=jnp.ones((R,), bool),
            has_ts=false_r,
            seek_delta=jnp.full((R,), TICKS_PER_SECOND * CHUNK_SIZE,
                                jnp.int32),
            result_len=jnp.zeros((R,), jnp.int32),
            cum=jnp.zeros((R,)),
            completed=dead_r, failed=false_r,
            # at step 0 each stream's beams are identical copies: only its
            # beam 0 expands
            live_mask_init=(jnp.arange(R) % K) == 0,
            rng=rng_keys,                       # (S, 2) per-stream keys
        )

        def cond(s):
            return (s["i"] < N) & ~jnp.all(s["completed"] | s["failed"])

        def body(s):
            i = s["i"]
            live = ~(s["completed"] | s["failed"])
            expand = live & jnp.where(i == 0, s["live_mask_init"], True)

            scores = s["cum"][:, None] + s["logprobs"]
            scores = jnp.where(expand[:, None], scores, NEG_INF)

            # t > 0: each expanding beam draws K candidates from ITS
            # stream's key (whisper.cpp:5357-5430); duplicates collapse.
            # lax.cond skips the (S, K, K, V) threefry draw entirely at
            # t == 0 (deterministic rung: the draws were discarded by the
            # select anyway, and rung keys are fresh per call) — at
            # S x K = 12 x 5 that draw is ~15M threefry samples per STEP
            def _deterministic(_):
                return scores, s["rng"]

            def _multinomial(_):
                pairs = jax.vmap(jax.random.split)(s["rng"])  # (S, 2, 2)
                rng2, subs = pairs[:, 0], pairs[:, 1]
                drawn = jax.vmap(
                    lambda key, lp_s: jax.random.categorical(
                        key, lp_s, axis=-1, shape=(K, K)).T
                )(subs, s["logprobs"].reshape(S, K, V))       # (S, K, K)
                drawn_flat = drawn.reshape(R, K)
                drawn_mask = jnp.zeros((R, V), bool).at[
                    jnp.arange(R)[:, None], drawn_flat].set(True)
                return jnp.where(drawn_mask, scores, NEG_INF), rng2

            scores, rng = jax.lax.cond(
                temperature < 1e-6, _deterministic, _multinomial, None)

            # per-stream global top-k over (K * V) continuations
            flat = scores.reshape(S, K * V)
            top_vals, top_idx = jax.lax.top_k(flat, K)       # (S, K)
            parent_within = (top_idx // V).astype(jnp.int32)
            tok_cand = (top_idx % V).astype(jnp.int32)
            stream_base = (jnp.arange(S, dtype=jnp.int32) * K)[:, None]
            cand_parent = (parent_within + stream_base).reshape(R)
            cand_tok = tok_cand.reshape(R)
            cand_val = top_vals.reshape(R)

            # live slots take candidates rank-order WITHIN their stream
            live_sk = live.reshape(S, K)
            slot_rank = jnp.cumsum(live_sk.astype(jnp.int32), axis=1) - 1
            slot_rank = jnp.clip(slot_rank, 0, K - 1)
            rank_glob = (slot_rank + stream_base).reshape(R)
            parent_b = jnp.where(live, cand_parent[rank_glob],
                                 jnp.arange(R, dtype=jnp.int32))
            tok = jnp.where(live, cand_tok[rank_glob],
                            s["tokens"][:, jnp.maximum(i - 1, 0)])
            new_cum = jnp.where(live, cand_val[rank_glob], s["cum"])

            # ---- gather parent state for live slots ----------------------
            # parent_b falls back to the identity index for non-live rows,
            # so a plain gather IS the select — no post-gather where (which
            # would read both copies and cost ~1.5x the traffic on the KV)
            def g(x):
                return x[parent_b]

            tokens = g(s["tokens"])
            p_arr = g(s["p"]); plog_arr = g(s["plog"])
            tid_arr = g(s["tid"]); pt_arr = g(s["pt"])
            ptsum_arr = g(s["ptsum"])
            has_ts = s["has_ts"][parent_b]
            seek_delta = s["seek_delta"][parent_b]
            result_len = s["result_len"][parent_b]
            last_was_ts_p = s["last_was_ts"][parent_b]
            probs_g = s["probs"][parent_b]
            logprobs_g = s["logprobs"][parent_b]

            # KV reorder: one gather on the row axis (parents never cross
            # streams by construction — parent ids are stream-local + base)
            kv_k = s["kv_k"][:, parent_b]
            kv_v = s["kv_v"][:, parent_b]

            # ---- record token + metadata ----------------------------------
            b = jnp.arange(R)
            p_tok = probs_g[b, tok]
            plog_tok = logprobs_g[b, tok]
            tid, pt, ptsum = sample_token_data(probs_g, logprobs_g, consts)
            is_ts = tok >= token_beg
            tid = jnp.where(is_ts, tok, tid).astype(jnp.int32)
            pt = jnp.where(is_ts, p_tok, pt)

            tokens = tokens.at[:, i].set(jnp.where(live, tok, tokens[:, i]))
            p_arr = p_arr.at[:, i].set(jnp.where(live, p_tok, 0.0))
            plog_arr = plog_arr.at[:, i].set(jnp.where(live, plog_tok, 0.0))
            tid_arr = tid_arr.at[:, i].set(jnp.where(live, tid, 0))
            pt_arr = pt_arr.at[:, i].set(jnp.where(live, pt, 0.0))
            ptsum_arr = ptsum_arr.at[:, i].set(jnp.where(live, ptsum, 0.0))

            has_ts, seek_delta, result_len, completed, failed = \
                token_state_update(
                    consts, cfg, i=i, tok=tok, live=live, has_ts=has_ts,
                    seek_delta=seek_delta, result_len=result_len,
                    completed=s["completed"], failed=s["failed"],
                    seek=seeks_r, seek_end=ends_r, N=N)

            def do_decode(_):
                pos_ids = jnp.minimum(P - pad_len_r + i, cfg.n_text_ctx - 1)
                lg_raw, kv = wm.decode_step(
                    params, tok, pos_ids, P + i,
                    {"k": kv_k, "v": kv_v}, kc_loop, vc_loop,
                    kv_len=P + i + 1, n_head=cfg.n_head, pad_len=pad_len_r,
                    compute_dtype=cfg.compute_dtype, group=K)
                return lg_raw, kv["k"], kv["v"]

            def skip(_):
                return logprobs_g, kv_k, kv_v

            any_live = ~jnp.all(completed | failed)
            lg_raw, kv_k, kv_v = jax.lax.cond(
                any_live & (i + 1 < N), do_decode, skip, None)

            last_was_ts = jnp.where(live, tok >= token_beg, s["last_was_ts"])
            penult_was_ts = jnp.where(live, last_was_ts_p,
                                      s["penult_was_ts"])

            _, lp, pr = process_logits(
                lg_raw, temperature,
                is_initial=jnp.zeros_like(live),
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta)

            return dict(
                i=i + 1, kv_k=kv_k, kv_v=kv_v, logprobs=lp, probs=pr,
                tokens=tokens, p=p_arr, plog=plog_arr, tid=tid_arr,
                pt=pt_arr, ptsum=ptsum_arr,
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
                cum=new_cum, completed=completed, failed=failed,
                live_mask_init=s["live_mask_init"], rng=rng)

        final = jax.lax.while_loop(cond, body, state)

        return {
            "tokens": final["tokens"],
            "p": final["p"], "plog": final["plog"],
            "tid": final["tid"], "pt": final["pt"], "ptsum": final["ptsum"],
            "n_tokens": final["i"],
            "has_ts": final["has_ts"],
            "seek_delta": final["seek_delta"],
            "result_len": final["result_len"],
            "sum_logprobs_all": final["cum"],
            "completed": final["completed"],
            "failed": final["failed"],
            # tiled to rows so host ranking indexes row0 = s*K uniformly
            "no_speech_prob": jnp.repeat(no_speech_prob, K),
        }

    return decode_window

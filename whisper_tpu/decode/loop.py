"""On-device autoregressive decoding loop.

The reference decodes one token per device round-trip, pulling the full
logits back to the host every step (reference: src/whisper.cpp:2960-2966,
token loop :5843-6166).  Here the entire window decode — prompt processing,
token sampling, the logit-filter chain, timestamp/sliding-window state
updates and stop conditions — runs inside ONE jitted `lax.while_loop`; the
host receives the finished token buffer per 30 s window.

Variable-length prompts are handled with LEFT padding inside a fixed-size
prompt buffer (static shape ⇒ no recompilation per window): pad slots are
masked out of attention and position ids are shifted, so the math matches
the reference's dense prompt decode exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..constants import CHUNK_SIZE, TICKS_PER_SECOND
from ..models import whisper as wm
from .filters import FilterConsts, FilterOptions, make_process_logits, sample_token_data

DELTA_MIN = 10  # 100 ms in ticks (reference: src/whisper.cpp:5533)


class LoopState(NamedTuple):
    i: jnp.ndarray                 # scalar i32 — token index
    kv_k: jnp.ndarray              # (L, B, C, H, Dh)
    kv_v: jnp.ndarray
    logits: jnp.ndarray            # (B, V) filtered logits for step i
    logprobs: jnp.ndarray          # (B, V)
    probs: jnp.ndarray             # (B, V)
    tokens: jnp.ndarray            # (B, N) i32
    p: jnp.ndarray                 # (B, N) f32 — prob of sampled token
    plog: jnp.ndarray              # (B, N) f32 — logprob of sampled token
    tid: jnp.ndarray               # (B, N) i32 — most probable ts token
    pt: jnp.ndarray                # (B, N) f32
    ptsum: jnp.ndarray             # (B, N) f32
    last_was_ts: jnp.ndarray       # (B,) bool
    penult_was_ts: jnp.ndarray     # (B,) bool
    has_ts: jnp.ndarray            # (B,) bool
    seek_delta: jnp.ndarray        # (B,) i32
    result_len: jnp.ndarray        # (B,) i32
    sum_logprobs_all: jnp.ndarray  # (B,) f32
    completed: jnp.ndarray         # (B,) bool
    failed: jnp.ndarray            # (B,) bool
    rng: jnp.ndarray               # PRNG key


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Static knobs compiled into the loop."""
    n_head: int
    n_text_ctx: int
    prompt_size: int      # P: fixed prompt buffer length
    max_tokens_loop: int  # N: loop bound = n_text_ctx // 2 - 4
    max_tokens_param: int  # params.max_tokens (0 = unlimited)
    single_segment: bool
    no_timestamps: bool
    compute_dtype: Any = jnp.bfloat16
    # cross-attention path for the token loop: "einsum" (XLA), "pallas"
    # (fused kernel), "pallas_q8" (fused kernel + int8 K/V).  The prompt
    # pass always uses einsum (multi-query).
    cross_mode: str = "einsum"



def token_state_update(consts, cfg, *, i, tok, live, has_ts, seek_delta,
                       result_len, completed, failed, seek, seek_end, N):
    """Per-token decoder state update, shared by greedy and beam loops.

    Implements the reference's post-sample rules
    (reference: src/whisper.cpp:5990-6065): timestamp-driven sliding-window
    update, end-of-segment detection, repetition-loop bailout.
    Returns (has_ts, seek_delta, result_len, completed, failed).
    """
    token_beg = consts.token_beg
    token_eot = consts.token_eot

    is_ts_update = live & (tok > token_beg)
    seek_delta_new = 2 * (tok - token_beg)
    goes_back = has_ts & (seek_delta > seek_delta_new) & (result_len < i)
    failed = failed | (is_ts_update & goes_back)
    apply_ts = is_ts_update & ~goes_back
    seek_delta = jnp.where(apply_ts, seek_delta_new, seek_delta)
    result_len = jnp.where(apply_ts, i + 1, result_len)
    has_ts = has_ts | apply_ts

    still_live = live & ~(is_ts_update & goes_back)
    eos = (tok == token_eot)
    if cfg.max_tokens_param > 0:
        eos = eos | (i >= cfg.max_tokens_param)
    eos = eos | (has_ts & (seek + seek_delta + DELTA_MIN >= seek_end))
    eos = still_live & eos

    if not cfg.no_timestamps:
        zero_len = eos & (result_len == 0)
        at_end = seek + seek_delta + DELTA_MIN >= seek_end
        result_len = jnp.where(zero_len & at_end, i + 1, result_len)
        failed = failed | (zero_len & ~at_end)
        eos = eos & ~(zero_len & ~at_end)
    if cfg.single_segment or cfg.no_timestamps:
        result_len = jnp.where(eos, i + 1, result_len)
        seek_delta = jnp.where(
            eos, TICKS_PER_SECOND * CHUNK_SIZE, seek_delta)
    completed = completed | eos

    live2 = still_live & ~eos
    rep = (i == N - 1) & (
        (result_len == 0)
        | (seek_delta < TICKS_PER_SECOND * CHUNK_SIZE // 2))
    failed = failed | (live2 & rep)
    return has_ts, seek_delta, result_len, completed, failed


def make_decode_window(params_treedef_free_fn=None, *,
                       consts: FilterConsts,
                       options: FilterOptions,
                       cfg: LoopConfig,
                       strategy: str = "greedy",
                       extra_suppress: tuple = (),
                       mesh=None):
    """Build the jitted window-decode function.

    strategy: "greedy" (argmax at t==0, multinomial draw at t>0 — the
    reference's WHISPER_SAMPLING_GREEDY, src/whisper.cpp:5875-5883).
    Beam search lives in beam.py.

    mesh: optional jax.sharding.Mesh — pins the self-attention KV cache to
    an explicit (None, "data", "model", None, None) layout so the while
    carry stays batch-sharded/head-sharded instead of relying on GSPMD
    propagation.
    """
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
    token_beg = consts.token_beg
    token_eot = consts.token_eot

    def sample(state: LoopState, temperature):
        """-> (token id (B,), p, plog, tid, pt, ptsum).

        state.rng is either one (2,) key (legacy: one joint categorical
        over the batch, so a row's draw depends on its slot position) or
        a (B, 2) per-row key array: every row advances its OWN
        counter-based stream, so its draws depend only on (key, logits) —
        independent of slot position and batch composition.  Callers
        derive per-row keys from (seek, attempt, candidate), which is what
        makes the batched serving ladder bit-identical to the serial
        per-window path (the reference's draws are rand()-seeded and not
        reproducible either way; reference: src/whisper.cpp:5875-5883).
        """
        if state.rng.ndim == 2:                      # (B, 2) per-row keys
            pairs = jax.vmap(jax.random.split)(state.rng)   # (B, 2, 2)
            rng, subs = pairs[:, 0], pairs[:, 1]
            drawn_id = jax.vmap(jax.random.categorical)(subs, state.logprobs)
        else:
            rng, sub = jax.random.split(state.rng)
            drawn_id = jax.random.categorical(sub, state.logprobs, axis=-1)
        greedy_id = jnp.argmax(state.probs, axis=-1)
        tok = jnp.where(temperature < 1e-6, greedy_id, drawn_id).astype(jnp.int32)

        b = jnp.arange(tok.shape[0])
        p = state.probs[b, tok]
        plog = state.logprobs[b, tok]
        tid, pt, ptsum = sample_token_data(state.probs, state.logprobs, consts)
        # a sampled timestamp token overrides tid/pt (whisper.cpp:5348-5351)
        is_ts = tok >= token_beg
        tid = jnp.where(is_ts, tok, tid).astype(jnp.int32)
        pt = jnp.where(is_ts, p, pt)
        return rng, tok, p, plog, tid, pt, ptsum

    def decode_window(params, k_cross, v_cross, prompt, pad_len,
                      temperature, seek, seek_end, rng_key, row_live=None):
        """Run one full window decode on device.

        params: model pytree
        k_cross/v_cross: (L, B, H, Dh, Ta) cross-attention KV, or a
        pre-quantized (codes int8 (L,B,H,Dh,Ta), scales f32 (L,B,H,Ta))
        pair from cross_kv_q8 (requires a q8 cross_mode) — the fused form
        whose bf16 stack never materializes (large-v3 B=64 OOMs otherwise)
        prompt: (B, P) i32 — LEFT-padded prompt (pad value irrelevant)
        pad_len: (B,) i32 — number of pad slots at the start of each row
        temperature: scalar f32
        seek: scalar i32 (ticks) — window start; seek_end: scalar i32
        row_live: optional (B,) bool — rows marked dead start completed and
        never decode; lets callers pad partial batches to a fixed B so the
        temperature-fallback ladder never triggers a fresh compile
        (the reference reuses its fixed 8-decoder batch the same way).
        Returns dict of result arrays (see below) + no_speech_prob.
        """
        prequant = not hasattr(k_cross, "shape")   # (codes, scales) pair
        if prequant:
            assert cfg.cross_mode in ("einsum_q8", "pallas_q8dt",
                                      "einsum_q8i", "einsum_q4"), \
                f"pre-quantized cross-KV needs a q8/q4 cross_mode, " \
                f"got {cfg.cross_mode}"
            kq_shape = k_cross[0].shape
            L, Dh = kq_shape[0], kq_shape[3]
            if cfg.cross_mode == "einsum_q4":
                Dh *= 2   # codes are nibble-packed along Dh
        else:
            L, Dh = k_cross.shape[0], k_cross.shape[3]   # (L, B, H, Dh, Ta)
        B = prompt.shape[0]
        H = cfg.n_head
        C = P + N + 1

        # ---- prompt processing -------------------------------------------
        idx = jnp.arange(P)
        positions = jnp.maximum(idx[None, :] - pad_len[:, None], 0)
        # causal + pad mask: (B, 1, P, P)
        q = idx[None, :, None]
        k = idx[None, None, :]
        # pad queries must keep at least one valid key (themselves):
        # a fully-masked softmax row is NaN and the NaN would poison later
        # layers' K/V for the real positions
        valid = (k <= q) & ((k >= pad_len[:, None, None]) | (k == q))
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None]

        if prequant:
            ptag = "q4" if cfg.cross_mode == "einsum_q4" else "q8"
            kc_p = (ptag,) + tuple(k_cross)   # decode_prompt's tagged form
            vc_p = (ptag,) + tuple(v_cross)
        else:
            kc_p, vc_p = k_cross, v_cross
        logits_all, k_self, v_self = wm.decode_prompt(
            params, prompt, positions, kc_p, vc_p, cfg.n_head,
            self_mask=mask, compute_dtype=cfg.compute_dtype)
        logits0 = logits_all[:, -1]                       # (B, V)

        # no-speech probability from the raw first logits
        # (reference: src/whisper.cpp:5812-5820)
        no_speech_prob = jax.nn.softmax(logits0, axis=-1)[:, consts.token_nosp]

        # cross-KV layout for the token loop (transposed once per window;
        # amortized over every decode step)
        if cfg.cross_mode in ("einsum_q8", "pallas_q8dt", "einsum_q8i",
                              "einsum_q4"):
            tag = {"einsum_q8": "q8e", "pallas_q8dt": "q8dt",
                   "einsum_q8i": "q8i", "einsum_q4": "q4e"}[cfg.cross_mode]
            if prequant:   # already (codes, scales) from cross_kv_q8/_q4
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
        elif cfg.cross_mode == "pallas":
            kc_loop = ("bhtd", k_cross.transpose(0, 1, 2, 4, 3)
                       .astype(cfg.compute_dtype))
            vc_loop = ("bhtd", v_cross.transpose(0, 1, 2, 4, 3)
                       .astype(cfg.compute_dtype))
        elif cfg.cross_mode == "pallas_q8":
            from ..ops.cross_attention import quantize_kv
            kq, ks = quantize_kv(k_cross.transpose(0, 1, 2, 4, 3))
            vq, vs = quantize_kv(v_cross.transpose(0, 1, 2, 4, 3))
            kc_loop = {"q": kq, "s": ks}
            vc_loop = {"q": vq, "s": vs}
        else:
            kc_loop, vc_loop = k_cross, v_cross

        # cache layout (L, B, H, Dh, C): lane-tight like cross_kv
        kv_k = jnp.zeros((L, B, H, Dh, C), cfg.compute_dtype)
        kv_v = jnp.zeros((L, B, H, Dh, C), cfg.compute_dtype)
        kv_k = constrain_kv(kv_k.at[..., :P].set(
            k_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)))
        kv_v = constrain_kv(kv_v.at[..., :P].set(
            v_self.transpose(0, 1, 3, 4, 2).astype(cfg.compute_dtype)))

        false_b = jnp.zeros((B,), bool)
        dead = false_b if row_live is None else ~row_live
        lg, lp, pr = process_logits(
            logits0, temperature,
            is_initial=jnp.ones((B,), bool),
            last_was_ts=false_b, penult_was_ts=jnp.ones((B,), bool),
            has_ts=false_b, seek_delta=jnp.zeros((B,), jnp.int32))

        init = LoopState(
            i=jnp.int32(0),
            kv_k=kv_k, kv_v=kv_v,
            logits=lg, logprobs=lp, probs=pr,
            tokens=jnp.full((B, N), token_eot, jnp.int32),
            p=jnp.zeros((B, N)), plog=jnp.zeros((B, N)),
            tid=jnp.zeros((B, N), jnp.int32),
            pt=jnp.zeros((B, N)), ptsum=jnp.zeros((B, N)),
            # last_was_ts=True: its first USE is as next step's
            # penultimate flag, which must be true while size < 2
            # (reference: whisper.cpp:5133)
            last_was_ts=jnp.ones((B,), bool),
            penult_was_ts=jnp.ones((B,), bool),
            has_ts=false_b,
            seek_delta=jnp.full((B,), TICKS_PER_SECOND * CHUNK_SIZE, jnp.int32),
            result_len=jnp.zeros((B,), jnp.int32),
            sum_logprobs_all=jnp.zeros((B,)),
            completed=dead, failed=false_b,
            rng=rng_key,
        )

        def cond(s: LoopState):
            return (s.i < N) & ~jnp.all(s.completed | s.failed)

        def body(s: LoopState):
            i = s.i
            live = ~(s.completed | s.failed)

            rng, tok, p, plog, tid, pt, ptsum = sample(s, temperature)

            # record only for live decoders
            wr = live
            tokens = s.tokens.at[:, i].set(jnp.where(wr, tok, s.tokens[:, i]))
            p_arr = s.p.at[:, i].set(jnp.where(wr, p, 0.0))
            plog_arr = s.plog.at[:, i].set(jnp.where(wr, plog, 0.0))
            tid_arr = s.tid.at[:, i].set(jnp.where(wr, tid, 0))
            pt_arr = s.pt.at[:, i].set(jnp.where(wr, pt, 0.0))
            ptsum_arr = s.ptsum.at[:, i].set(jnp.where(wr, ptsum, 0.0))
            sum_lp = s.sum_logprobs_all + jnp.where(wr, plog, 0.0)

            # ---- state update (reference: src/whisper.cpp:5990-6065) -----
            has_ts, seek_delta, result_len, completed, failed = \
                token_state_update(
                    consts, cfg, i=i, tok=tok, live=live, has_ts=s.has_ts,
                    seek_delta=s.seek_delta, result_len=s.result_len,
                    completed=s.completed, failed=s.failed,
                    seek=seek, seek_end=seek_end, N=N)

            # ---- next-token logits (skipped when everyone is done) -------
            def do_decode(_):
                pos_ids = jnp.minimum(P - pad_len + i, cfg.n_text_ctx - 1)
                lg_raw, kv = wm.decode_step(
                    params, tok, pos_ids, P + i,
                    {"k": s.kv_k, "v": s.kv_v}, kc_loop, vc_loop,
                    kv_len=P + i + 1, n_head=cfg.n_head, pad_len=pad_len,
                    compute_dtype=cfg.compute_dtype)
                return lg_raw, kv["k"], kv["v"]

            def skip_decode(_):
                return s.logits, s.kv_k, s.kv_v

            any_live = ~jnp.all(completed | failed)
            lg_raw, kv_k, kv_v = jax.lax.cond(
                any_live & (i + 1 < N), do_decode, skip_decode, None)

            last_was_ts = jnp.where(live, tok >= token_beg, s.last_was_ts)
            penult_was_ts = jnp.where(live, s.last_was_ts, s.penult_was_ts)

            lg, lp, pr = process_logits(
                lg_raw, temperature,
                is_initial=jnp.zeros_like(live),
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta)

            return LoopState(
                i=i + 1, kv_k=kv_k, kv_v=kv_v,
                logits=lg, logprobs=lp, probs=pr,
                tokens=tokens, p=p_arr, plog=plog_arr, tid=tid_arr,
                pt=pt_arr, ptsum=ptsum_arr,
                last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
                has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
                sum_logprobs_all=sum_lp,
                completed=completed, failed=failed, rng=rng)

        final = jax.lax.while_loop(cond, body, init)

        return {
            "tokens": final.tokens,
            "p": final.p, "plog": final.plog,
            "tid": final.tid, "pt": final.pt, "ptsum": final.ptsum,
            "n_tokens": final.i,
            "has_ts": final.has_ts,
            "seek_delta": final.seek_delta,
            "result_len": final.result_len,
            "sum_logprobs_all": final.sum_logprobs_all,
            "completed": final.completed,
            "failed": final.failed,
            "no_speech_prob": no_speech_prob,
        }

    return decode_window

"""Vectorized, jit-compatible logit-filter chain.

Implements the exact rule order of the reference `whisper_process_logits`
(reference: src/whisper.cpp:5015-5283) as masked array ops over a whole
batch of decoders at once, so the chain can run inside the on-device token
loop (the reference runs it per-decoder on the host each token).

Rules that are inherently host-side (suppress_regex over the vocab, the
user logits callback, GBNF grammar) are handled by precomputing a static
suppress-mask (regex) or by the slow compatibility path in the orchestrator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CHUNK_SIZE
from ..weights.ggml_reader import Vocab

NEG_INF = float("-inf")

# reference: src/whisper.cpp:4968-4973
NON_SPEECH_TOKENS = [
    "\"", "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">", "@", "[",
    "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「", "」", "『", "』",
    "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", "(\"", "((",
    "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪", "♩", "♪",
    "♫", "♬", "♭", "♮", "♯",
]


@dataclasses.dataclass(frozen=True)
class FilterConsts:
    """Static per-model constants baked into the jitted filter chain."""
    n_vocab: int
    token_eot: int
    token_sot: int
    token_beg: int
    token_not: int
    token_nosp: int
    token_solm: int
    token_prev: int
    token_translate: int
    token_transcribe: int
    token_space: int            # id of " " (suppress-blank rule)
    lang_ids: tuple[int, ...]   # language token ids
    nst_ids: tuple[int, ...]    # non-speech token ids present in the vocab
    precision: float            # CHUNK_SIZE / n_audio_ctx (ts resolution, s)

    @classmethod
    def from_vocab(cls, vocab: Vocab, n_audio_ctx: int) -> "FilterConsts":
        lang_ids = tuple(vocab.token_lang(i) for i in range(100))
        nst = []
        for token in NON_SPEECH_TOKENS:
            for cand in (token, " " + token):
                tid = vocab.token_to_id.get(cand.encode("utf-8"))
                if tid is not None:
                    nst.append(tid)
        # allow "-"/"'" only inside words (reference: whisper.cpp:5121-5127)
        for cand in (" -", " '"):
            tid = vocab.token_to_id.get(cand.encode("utf-8"))
            if tid is not None:
                nst.append(tid)
        space = vocab.token_to_id.get(b" ", 220)
        return cls(
            n_vocab=vocab.n_vocab,
            token_eot=vocab.token_eot,
            token_sot=vocab.token_sot,
            token_beg=vocab.token_beg,
            token_not=vocab.token_not,
            token_nosp=vocab.token_nosp,
            token_solm=vocab.token_solm,
            token_prev=vocab.token_prev,
            token_translate=vocab.token_translate,
            token_transcribe=vocab.token_transcribe,
            token_space=space,
            lang_ids=lang_ids,
            nst_ids=tuple(sorted(set(nst))),
            precision=float(CHUNK_SIZE) / n_audio_ctx,
        )


@dataclasses.dataclass(frozen=True)
class FilterOptions:
    """Static decode options affecting the filter chain (subset of
    whisper_full_params; reference: include/whisper.h:476-573)."""
    suppress_blank: bool = True
    no_timestamps: bool = False
    tdrz_enable: bool = False
    suppress_nst: bool = False
    max_initial_ts: float = 1.0


def _static_suppress_mask(c: FilterConsts, o: FilterOptions,
                          extra_suppress: tuple[int, ...] = ()) -> np.ndarray:
    """Additive mask of the state-independent suppressions (f32, (V,))."""
    m = np.zeros((c.n_vocab,), dtype=np.float32)
    m[c.token_not] = NEG_INF
    if o.no_timestamps:
        m[c.token_beg:] = NEG_INF
    m[c.token_sot] = NEG_INF
    m[c.token_nosp] = NEG_INF
    if not o.tdrz_enable:
        m[c.token_solm] = NEG_INF
    m[c.token_translate] = NEG_INF
    m[c.token_transcribe] = NEG_INF
    m[c.token_prev] = NEG_INF
    for lid in c.lang_ids:
        if lid < c.n_vocab:
            m[lid] = NEG_INF
    if o.suppress_nst:
        for tid in c.nst_ids:
            m[tid] = NEG_INF
    for tid in extra_suppress:   # suppress_regex resolved on the host
        m[tid] = NEG_INF
    return m


def make_process_logits(c: FilterConsts, o: FilterOptions,
                        extra_suppress: tuple[int, ...] = ()):
    """Build the jit-compatible `process(logits, state...)` function.

    Returned fn signature:
        process(logits (B,V) f32,
                temperature () f32,
                is_initial (B,) bool,
                last_was_ts (B,) bool,
                penult_was_ts (B,) bool,
                has_ts (B,) bool,
                seek_delta (B,) i32) -> (logits, logprobs, probs)

    Matches reference order: temperature scale -> suppressions ->
    timestamp pairing -> max_initial_ts -> monotonic ts floor ->
    log_softmax -> timestamp-sum rule -> softmax.
    """
    static_mask = jnp.asarray(_static_suppress_mask(c, o, extra_suppress))
    V = c.n_vocab
    ids = jnp.arange(V)
    is_ts_token = ids >= c.token_beg                    # (V,)
    is_text_token = ids < c.token_beg
    tid0_init = int(round(o.max_initial_ts / c.precision))

    def process(logits, temperature, is_initial, last_was_ts,
                penult_was_ts, has_ts, seek_delta):
        logits = logits.astype(jnp.float32)
        logits = jnp.where(temperature > 0.0, logits / jnp.maximum(temperature, 1e-6), logits)

        logits = logits + static_mask

        if o.suppress_blank:
            blank = jnp.zeros((V,), jnp.float32).at[c.token_eot].set(NEG_INF) \
                                                .at[c.token_space].set(NEG_INF)
            logits = jnp.where(is_initial[:, None], logits + blank, logits)

        # timestamps appear in pairs (reference: whisper.cpp:5128-5147)
        suppress_ts = last_was_ts & penult_was_ts
        suppress_text = last_was_ts & ~penult_was_ts
        logits = jnp.where(suppress_ts[:, None] & is_ts_token, NEG_INF, logits)
        logits = jnp.where(
            suppress_text[:, None] & (ids < c.token_eot), NEG_INF, logits)

        # initial timestamp <= max_initial_ts (reference: whisper.cpp:5149-5158)
        if o.max_initial_ts > 0.0:
            too_late = ids > (c.token_beg + tid0_init)
            logits = jnp.where(is_initial[:, None] & too_late, NEG_INF, logits)

        # timestamps must not decrease (reference: whisper.cpp:5160-5168)
        floor_id = c.token_beg + seek_delta // 2            # (B,)
        below = is_ts_token & (ids[None, :] < floor_id[:, None])
        logits = jnp.where(has_ts[:, None] & below, NEG_INF, logits)

        logprobs = jax.nn.log_softmax(logits, axis=-1)

        # timestamp-sum rule (reference: whisper.cpp:5173-5199)
        ts_lse = jax.nn.logsumexp(
            jnp.where(is_ts_token, logprobs, NEG_INF), axis=-1)   # (B,)
        max_text = jnp.max(
            jnp.where(is_text_token, logprobs, NEG_INF), axis=-1)
        force_ts = ts_lse > max_text
        logits = jnp.where(force_ts[:, None] & is_text_token, NEG_INF, logits)
        logprobs = jnp.where(force_ts[:, None] & is_text_token, NEG_INF, logprobs)

        probs = jnp.exp(logprobs)
        return logits, logprobs, probs

    return process


def sample_token_data(probs, logprobs, c: FilterConsts):
    """Per-token metadata shared by all samplers: most-probable timestamp
    token and the timestamp probability mass
    (reference: whisper_sample_token src/whisper.cpp:5298-5330).

    probs/logprobs: (B, V).  Returns (tid (B,), pt (B,), ptsum (B,)).
    """
    ids = jnp.arange(c.n_vocab)
    ts_probs = jnp.where(ids >= c.token_beg, probs, 0.0)
    ptsum = jnp.sum(ts_probs, axis=-1)
    tid = jnp.argmax(ts_probs, axis=-1)
    max_ts = jnp.max(ts_probs, axis=-1)
    pt = max_ts / (ptsum + 1e-10)
    return tid, pt, ptsum

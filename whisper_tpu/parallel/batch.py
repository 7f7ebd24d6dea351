"""Batched multi-stream transcription — the TPU throughput path.

The reference's only multi-stream story is thread-per-chunk CPU parallelism
(whisper_full_parallel, reference: src/whisper.cpp:6407-6520).  On TPU the
win comes from batching: B independent 30 s windows (from different files,
streams, or chunks of one long file) ride one jitted encoder pass and one
on-device decode loop.  Each stream keeps its own sliding-window state
(seek, prompt-past, segments) on the host; window scheduling is decoupled
from the batched device step, so streams may advance by different
seek_deltas (SURVEY §7 hard-part (f)).

This is what `bench.py`'s ≥200x realtime numbers correspond to in API form.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..api import (FullParams, Segment, WhisperContext, WhisperState,
                   _rank_window_candidates, full_default_params, window_rng)
from ..audio.mel import log_mel_spectrogram
from ..constants import CHUNK_SIZE, TICKS_PER_SECOND
from ..decode.filters import FilterOptions
from ..languages import lang_id as _lang_id, lang_str
from ..utils.logging import log_info

DELTA_MIN = 10


def _merge_candidate_rows(outs):
    """Merge decode-window results from several passes into one result
    whose rows are the union of each pass's live candidate rows — so
    _rank_window_candidates sees best_of > batch_size candidates exactly
    as if they had decoded in one call.

    outs: [(result_dict, n_live_rows), ...].  Per-row arrays concatenate;
    the batch-global step count n_tokens takes the max (it is only an
    upper bound for _own_sampled_len, which trims each row's OWN
    EOT-initialized tail, so a larger cap cannot change any row's
    emitted length)."""
    merged = {}
    first = outs[0][0]
    for key in first:
        if key == "n_tokens":
            merged[key] = max(int(o[key]) for o, _ in outs)
        else:
            merged[key] = np.concatenate(
                [np.asarray(o[key])[:cc] for o, cc in outs], axis=0)
    return merged


def _cross_fn_for(cross_mode: str):
    """Which cross-KV producer the batched encode uses for a cross_mode."""
    from ..models import whisper as wm
    if cross_mode == "einsum_q4":
        return wm.cross_kv_q4
    if cross_mode in ("einsum_q8", "pallas_q8dt", "einsum_q8i"):
        return wm.cross_kv_q8
    return wm.cross_kv


class StreamState(WhisperState):
    """Per-stream sliding-window session: a WhisperState plus window
    scheduling fields."""

    def __init__(self, mel, seek, seek_end):
        super().__init__()
        self.mel = mel
        self.seek = seek
        self.seek_end = seek_end
        self.done = False
        # per-stream [sot, lang, task, ...] — None until the batched
        # language pre-pass resolves an auto-language stream
        self.prompt_init: list[int] | None = None


class BatchTranscriber:
    """Transcribe many audio streams concurrently on one (or more) chips."""

    def __init__(self, ctx: WhisperContext, batch_size: int = 8,
                 params: FullParams | None = None, mesh=None,
                 device_mel: bool = False):
        """mesh: optional jax.sharding.Mesh with a "data" axis — windows are
        sharded over it (and params over its "model" axis if >1), scaling
        serving across chips via ICI (the reference's whisper_full_parallel
        / ggml-rpc role, SURVEY §2.6).

        device_mel: compute the mel spectrogram ON the TPU, fused into the
        batched encode (framing gather + DFT matmuls, audio/mel.py).  Kills
        the host-mel stage (~40% of serving wall at 48 streams).  Deviation:
        the log-mel max-normalization is then per 30 s window rather than
        per stream — the same chunk-local normalization the reference's
        stream example has (examples/stream/stream.cpp feeds whisper_full
        30 s chunks); off by default so batch == serial stays token-exact.
        """
        self.ctx = ctx
        self.B = batch_size
        self.mesh = mesh
        self.device_mel = device_mel
        if mesh is not None:
            from .mesh import shard_params
            n_data = mesh.shape["data"] * mesh.shape.get("slice", 1)
            assert batch_size % n_data == 0, \
                f"batch_size {batch_size} must divide over data={n_data}"
            ctx.params = shard_params(ctx.params, mesh)
            ctx.mesh = mesh   # _decode_window_fn pins explicit in_shardings
        self.params = params or full_default_params()
        p = self.params
        # language "auto" rides the batch: a batched [sot] pre-pass detects
        # each stream's language and pins its per-row prompt lang token
        # (reference parallel path runs detect per chunk the same way:
        # whisper_full_parallel -> whisper_full_with_state:5504)
        self.auto_lang = (p.language in (None, "", "auto")
                          or p.detect_language)
        if p.grammar_rules is not None or p.logits_filter_callback:
            # the ONE deliberate serial gate: grammar decoding is a
            # host-coupled PDA between device steps
            raise ValueError(
                "grammar / logits-filter decoding is host-looped — use the "
                "serial ctx.full() path (the server routes this "
                "automatically)")
        from ..api import MAX_DECODERS, SamplingStrategy as _SS
        if max(1, p.greedy.best_of,
               p.beam_search.beam_size if p.strategy == _SS.BEAM_SEARCH
               else 0) > MAX_DECODERS:
            # same contract as the serial path (reference: whisper.cpp
            # "too many decoders requested", WHISPER_MAX_DECODERS = 8)
            raise ValueError(
                f"too many decoders requested, max = {MAX_DECODERS}")
        if p.strategy == _SS.BEAM_SEARCH:
            # beams are coupled within every decode step (the per-stream
            # top-k spans K rows of one device call), so unlike greedy
            # best_of they cannot span passes; refuse rather than
            # silently decode fewer beams than the serial path would.
            # best_of bounds the t>0 retry rungs' slot count the same way
            # (whisper.cpp:5718-5724) but only matters when the fallback
            # ladder is live (temperature_inc > 0).
            need = p.beam_search.beam_size
            if p.temperature_inc > 0.0:
                need = max(need, p.greedy.best_of)
            if need > batch_size:
                raise ValueError(
                    f"beam search needs batch_size >= "
                    f"max(beam_size, ladder best_of) = {need} (got "
                    f"{batch_size}) — beam/candidate rows decode as "
                    f"coupled rows of one device batch")
        self.no_timestamps = p.no_timestamps
        self.opts = FilterOptions(
            suppress_blank=p.suppress_blank,
            no_timestamps=p.no_timestamps,
            tdrz_enable=p.tdrz_enable,
            suppress_nst=p.suppress_nst,
            max_initial_ts=p.max_initial_ts,
        )
        # phase wall-time accounting + per-iteration latencies; reset by
        # transcribe(), accumulated by _iterate() (which the continuous
        # batcher also drives directly)
        self.phase_times: dict[str, float] = {
            "upload": 0.0, "prep": 0.0, "encode": 0.0, "decode": 0.0,
            "finish": 0.0}
        self.window_times: list[tuple[int, float]] = []
        # ladder telemetry: windows decoded / windows that needed >=1 retry
        # rung (bench.py reports the retry rate next to quality-config RTF)
        self.n_windows = 0
        self.n_retried_windows = 0
        # finished windows awaiting the batched DTW cross-QK pass
        # (ctx.dtw_token_timestamps): (si, st, i_seg, n_new, seek, n_frames)
        self._dtw_jobs: list[tuple] = []
        # template prompt (pad rows, warmup, bucket sizing); auto-language
        # streams get a per-row copy with the detected lang token — same
        # length either way, so prompt bucketing is unaffected
        self.prompt_init = self._prompt_init_for(
            0 if self.auto_lang else _lang_id(p.language))

    def _prompt_init_for(self, lang_id: int) -> list[int]:
        """[sot, lang?, task?, not?] (reference: whisper.cpp:5627-5651)."""
        ctx = self.ctx
        p = self.params
        prompt = [ctx.vocab.token_sot]
        if ctx.vocab.is_multilingual:
            prompt.append(ctx.vocab.token_lang(lang_id))
            prompt.append(ctx.vocab.token_translate if p.translate
                          else ctx.vocab.token_transcribe)
        if p.no_timestamps:
            prompt.append(ctx.vocab.token_not)
        return prompt

    # -- jitted batched encode -------------------------------------------

    def _encode_batch(self, mel_windows):
        key = ("enc_batch", tuple(mel_windows.shape),
               str(mel_windows.dtype), self.ctx.cross_mode)
        if key not in self.ctx._jit_cache:
            from ..models import whisper as wm
            nh_a, nh_t = (self.ctx.config.n_audio_head,
                          self.ctx.config.n_text_head)
            cd = self.ctx.compute_dtype
            cross_fn = _cross_fn_for(self.ctx.cross_mode)

            n_ctx = self.ctx.hparams.n_audio_ctx
            filters = jnp.asarray(self.ctx.filters, jnp.float32)

            @jax.jit
            def run(params, mel):
                if mel.ndim == 2:   # device_mel: raw padded samples in
                    from ..audio.mel import log_mel_spectrogram_jax
                    if mel.dtype == jnp.int16:
                        mel = mel.astype(jnp.float32) * (1.0 / 32768.0)
                    mel = log_mel_spectrogram_jax(mel, filters)[:, :2 * n_ctx]
                enc = wm.encode(params, mel, n_head=nh_a, compute_dtype=cd)
                # quantization fused into the cross-KV scan: the full bf16
                # (L,B,H,Dh,Ta) stack never materializes (large-v3 B=64 is
                # ~7.9 GB/tensor — OOM otherwise)
                return cross_fn(params, enc, n_head=nh_t, compute_dtype=cd)

            self.ctx._jit_cache[key] = run
        return self.ctx._jit_cache[key](self.ctx.params,
                                        jnp.asarray(mel_windows))

    def _build_prompts(self, states, batch):
        """(carried-past prompts, bare prompts) for the streams in batch
        (reference prompt assembly: whisper.cpp:5759-5771)."""
        ctx = self.ctx
        p = self.params
        prompts = []        # with carried past (used while t < 0.5)
        prompts_bare = []   # prompt_init only (hot retries,
                            # reference: whisper.cpp:5763 t_cur<0.5 gate)
        for i in batch:
            st = states[i]
            prompt = []
            if st.prompt_past and p.n_max_text_ctx > 0:
                n_take = min(p.n_max_text_ctx,
                             ctx.hparams.n_text_ctx // 2,
                             len(st.prompt_past))
                prompt = [ctx.vocab.token_prev] + st.prompt_past[-n_take:]
            init = st.prompt_init if st.prompt_init is not None \
                else self.prompt_init
            prompts.append(prompt + init)
            prompts_bare.append(list(init))
        return prompts, prompts_bare

    # -- batched language auto-detect --------------------------------------

    def _detect_fn(self):
        """Jitted [sot]-step language-probability head: cross-KV ->
        (B, 100) softmax over the language tokens (reference serial form:
        whisper_lang_auto_detect_with_state, whisper.cpp:4027-4108)."""
        ctx = self.ctx
        key = ("lang_detect", self.B, ctx.cross_mode)
        if key not in ctx._jit_cache:
            from ..models import whisper as wm
            nh = ctx.config.n_text_head
            cd = ctx.compute_dtype
            lang_tok = jnp.asarray(
                [ctx.vocab.token_lang(i) for i in range(100)], jnp.int32)
            sot = ctx.vocab.token_sot

            cross_mode = ctx.cross_mode

            @jax.jit
            def run(params, kc, vc):
                # quantized cross modes hand back an untagged
                # (codes, scales) pair: tag it at trace time for
                # decode_prompt, like the serving loop (loop.py:207-238)
                prequant = not hasattr(kc, "shape")
                if prequant:
                    tag = "q4" if cross_mode == "einsum_q4" else "q8"
                    B = kc[0].shape[1]   # codes: (L, B, H, Dh, Ta)
                    kc = (tag,) + tuple(kc)
                    vc = (tag,) + tuple(vc)
                else:
                    B = kc.shape[1]
                prompts = jnp.full((B, 1), sot, jnp.int32)
                pos = jnp.zeros((B, 1), jnp.int32)
                logits, _, _ = wm.decode_prompt(
                    params, prompts, pos, kc, vc, n_head=nh,
                    compute_dtype=cd)
                ll = logits[:, -1, :].astype(jnp.float32)[:, lang_tok]
                return jax.nn.softmax(ll, axis=-1)

            ctx._jit_cache[key] = run
        return ctx._jit_cache[key]

    def _detect_languages(self, states, rows, pcm_dev=None) -> None:
        """Resolve auto-language streams in ONE batched pre-pass: encode
        each stream's first window (offset 0, like the serial path), run a
        single [sot] decode step, argmax the language-token probabilities,
        and pin the per-stream prompt lang token.  The batch path thereby
        carries language="auto" end-to-end instead of shunting to serial
        (reference carries it through its parallel path the same way:
        whisper_full_parallel -> :5504 -> :4027-4108)."""
        slot_streams = [rows[i] if i < len(rows) else None
                        for i in range(self.B)]
        seeks = np.zeros((self.B,), np.int32)
        kc, vc = self._encode_slots(states, slot_streams, pcm_dev,
                                    seeks=seeks)
        probs = np.asarray(self._detect_fn()(self.ctx.params, kc, vc))
        kc = vc = None
        for i, si in enumerate(rows):
            st = states[si]
            lid = int(np.argmax(probs[i]))
            st.lang_id_state = lid
            st.lang_probs = probs[i].copy()
            st.prompt_init = self._prompt_init_for(lid)
            log_info(f"auto-detected language: {lang_str(lid)} "
                     f"(p = {probs[i][lid]:.6f})")

    def _encode_batch_sliced(self, pcm_all, rows, starts):
        """Device-resident variant: streams' padded PCM lives on the device
        (uploaded once); per iteration only (B,) row indices and sample
        offsets cross the host boundary and windows are cut with
        dynamic_slice inside the jit — kills the ~2 MB/window/iteration
        host->device transfer of the upload-per-iteration path."""
        from ..constants import HOP_LENGTH, N_FFT
        key = ("enc_batch_sliced", tuple(pcm_all.shape), str(pcm_all.dtype),
               len(rows), self.ctx.cross_mode)
        if key not in self.ctx._jit_cache:
            from ..audio.mel import log_mel_spectrogram_jax
            from ..models import whisper as wm
            nh_a, nh_t = (self.ctx.config.n_audio_head,
                          self.ctx.config.n_text_head)
            cd = self.ctx.compute_dtype
            cross_fn = _cross_fn_for(self.ctx.cross_mode)
            n_ctx = self.ctx.hparams.n_audio_ctx
            S = 2 * n_ctx * HOP_LENGTH + N_FFT
            filters = jnp.asarray(self.ctx.filters, jnp.float32)

            @jax.jit
            def run(params, pcm_all, idx):
                rows, starts = idx[0], idx[1]   # one (2, B) upload
                windows = jax.vmap(
                    lambda r, s: jax.lax.dynamic_slice(
                        pcm_all, (r, s), (1, S))[0])(rows, starts)
                if windows.dtype == jnp.int16:
                    windows = windows.astype(jnp.float32) * (1.0 / 32768.0)
                mel = log_mel_spectrogram_jax(windows, filters)[:, :2 * n_ctx]
                enc = wm.encode(params, mel, n_head=nh_a, compute_dtype=cd)
                return cross_fn(params, enc, n_head=nh_t, compute_dtype=cd)

            self.ctx._jit_cache[key] = run
        return self.ctx._jit_cache[key](
            self.ctx.params, pcm_all,
            jnp.asarray(np.stack([rows, starts]).astype(np.int32)))

    # -- main driver -------------------------------------------------------

    def _make_stream(self, pcm) -> StreamState:
        """Host-side per-stream prep: mel (or padded PCM for device_mel),
        signal energy for token timestamps, window scheduling fields."""
        ctx = self.ctx
        p = self.params

        def _with_energy(st, pcm):
            # token-level timestamps need the per-stream signal energy the
            # serial full() computes (reference: whisper.cpp:5523); the
            # emission path reads it from the stream's state
            if p.token_timestamps:
                from ..timestamps import get_signal_energy
                arr = np.asarray(pcm)
                if arr.dtype == np.int16:
                    arr = arr.astype(np.float32) / 32768.0
                st.energy = get_signal_energy(arr, 32)
            return st

        if self.device_mel:
            # mel runs on the TPU inside _encode_batch; the host only
            # pads (reflect head + 30 s zero tail, audio/mel.py).
            # int16 streams stay packed s16le until after the on-device
            # window slice — half the h2d bytes, and bit-identical to
            # converting on the host (the serial path's s16/32768)
            from ..audio.mel import pad_audio
            from ..constants import N_FFT
            arr = np.asarray(pcm)
            if arr.dtype != np.int16:
                arr = arr.astype(np.float32)
            if len(arr) < 1 + N_FFT // 2:
                # too short for the reflect pad; zero-extend like a
                # silent signal (same guard as log_mel_spectrogram)
                arr = np.pad(arr, (0, 1 + N_FFT // 2 - len(arr)))
            padded, _, n_len_org = pad_audio(arr)
            st = StreamState(
                mel=None, seek=p.offset_ms // 10,
                seek_end=(n_len_org if p.duration_ms == 0
                          else p.offset_ms // 10 + p.duration_ms // 10))
            st.pcm_padded = padded
            st = _with_energy(st, pcm)
        else:
            mel, n_len_org = log_mel_spectrogram(
                np.asarray(pcm), ctx.filters)
            st = _with_energy(StreamState(
                mel=mel, seek=p.offset_ms // 10,
                seek_end=(n_len_org if p.duration_ms == 0
                          else p.offset_ms // 10 + p.duration_ms // 10)),
                pcm)
        if not self.auto_lang:
            st.prompt_init = list(self.prompt_init)
        if st.seek_end < st.seek + DELTA_MIN:
            st.done = True
        return st

    def transcribe(self, streams: list[np.ndarray]) -> list[list[Segment]]:
        """-> per-stream segment lists."""
        ctx = self.ctx
        states = [self._make_stream(pcm) for pcm in streams]

        # device_mel: keep every stream's padded PCM resident on the device
        # (one upload) and cut windows on-device, unless the total is large
        # or a mesh is attached (resident gathers would cross shards)
        import time as _time
        self.phase_times = {
            "upload": 0.0, "prep": 0.0, "encode": 0.0, "decode": 0.0,
            "finish": 0.0}
        self.window_times = []
        _t0 = _time.perf_counter()
        pcm_dev = None
        if self.device_mel and self.mesh is None:
            total = sum(st.pcm_padded.nbytes for st in states)
            if total <= 1 << 30:
                # bucket shapes (30 s length granularity, batch-multiple
                # rows) so repeat calls with similar workloads reuse the
                # compiled slicer
                s_max = max(len(st.pcm_padded) for st in states)
                gran = 16000 * CHUNK_SIZE
                s_max = -(-s_max // gran) * gran
                n_rows = -(-len(states) // self.B) * self.B
                all_i16 = all(st.pcm_padded.dtype == np.int16
                              for st in states)
                stack = np.zeros((n_rows, s_max),
                                 np.int16 if all_i16 else np.float32)
                for i, st in enumerate(states):
                    row = st.pcm_padded
                    if not all_i16 and row.dtype == np.int16:
                        row = row.astype(np.float32) / 32768.0
                    stack[i, :len(row)] = row
                pcm_dev = jnp.asarray(stack)
                del stack
        self.phase_times["upload"] = _time.perf_counter() - _t0

        while True:
            active = [i for i, st in enumerate(states) if not st.done]
            if not active:
                break
            self._iterate(states, active[:self.B], pcm_dev)

        self.last_states = states   # detection results, per-stream lang ids
        return [st.result_all for st in states]

    def _iterate(self, states, batch, pcm_dev=None) -> None:
        """One batched window iteration over the streams in `batch`
        (global indices into `states`): encode every stream's current
        window, run the temperature-fallback ladder, emit segments and
        advance seeks.  The continuous-batching server calls this
        directly, refilling `batch` between iterations."""
        import time as _time
        from ..api import SamplingStrategy
        ctx = self.ctx
        p = self.params
        _t_iter = _time.perf_counter()
        B = len(batch)

        # language pre-pass for any auto-language stream joining the
        # batch (fresh streams on the continuous path arrive unresolved)
        fresh = [i for i in batch if states[i].prompt_init is None]
        if fresh:
            self._detect_languages(states, fresh, pcm_dev)
            if p.detect_language:
                # detection IS the request (reference: whisper.cpp:5515)
                for i in fresh:
                    states[i].done = True
                self.window_times.append(
                    (B, _time.perf_counter() - _t_iter))
                return

        prompts, prompts_bare = self._build_prompts(states, batch)
        self.phase_times["prep"] += _time.perf_counter() - _t_iter

        if p.strategy == SamplingStrategy.BEAM_SEARCH:
            self._iterate_beam(states, batch, prompts, prompts_bare,
                               pcm_dev, _t_iter)
            return

        # temperature-fallback ladder, rebatching only the failed rows
        # (reference per-decoder ladder: src/whisper.cpp:5706-6230)
        temps = [p.temperature]
        if p.temperature_inc > 0.0:
            t = p.temperature + p.temperature_inc
            while t < 1.0 + 1e-6:
                temps.append(t)
                t += p.temperature_inc

        kc = vc = None
        tiled_cache: dict = {}   # cross-KV reuse across retry rungs
        self.n_windows += B
        pending = list(range(B))   # row indices into the original batch
        for it, t_cur in enumerate(temps):
            if not pending:
                break
            if it == 1:
                self.n_retried_windows += len(pending)
            last = it == len(temps) - 1
            cur_prompts = prompts if t_cur < 0.5 else prompts_bare
            # candidate count per window at this rung — the reference
            # samples best_of decoders whenever t > 0 and keeps the best
            # (whisper.cpp:5718-5724); at t == 0 greedy argmax needs one.
            # NOT capped at the batch size: when best_of > B a stream's
            # candidates span multiple passes (_ladder_retry_tiled merges
            # them before ranking), keeping batch == serial bit-identical
            # at any batch size
            n_cand = max(1, p.greedy.best_of) if t_cur > 0.0 else 1

            if n_cand == 1:
                # natural layout: one candidate per stream, rows stay in
                # their batch positions (no cross-KV movement); slots are
                # padded to the FIXED batch size so partial tails reuse
                # the compiled encode
                if kc is None:
                    _t0 = _time.perf_counter()
                    kc, vc = self._encode_slots(
                        states,
                        list(batch) + [None] * (self.B - B), pcm_dev)
                    import os as _os
                    if _os.environ.get("WTPU_PHASE_FENCE") == "1":
                        # measurement only: encode dispatch is async, so
                        # without a fence its cost lands in the decode phase
                        jax.block_until_ready(kc)
                    self.phase_times["encode"] += _time.perf_counter() - _t0
                live = np.zeros((self.B,), bool)
                live[pending] = True
                seeks = np.zeros((self.B,), np.int32)
                ends = np.zeros((self.B,), np.int32)
                keys = np.zeros((self.B, 2), np.uint32)
                for r in pending:
                    st = states[batch[r]]
                    seeks[r] = st.seek
                    ends[r] = st.seek_end
                    keys[r] = window_rng(st.seek, it, 1)[0]
                _t0 = _time.perf_counter()
                out = self._decode_rows(
                    [cur_prompts[r] if r < B and live[r] else
                     list(self.prompt_init) for r in range(self.B)],
                    kc, vc, live, seeks, ends, t_cur, keys)
                self.phase_times["decode"] += _time.perf_counter() - _t0
                _t0 = _time.perf_counter()
                still_failed = []
                for r in pending:
                    st = states[batch[r]]
                    best, _ = _rank_window_candidates(
                        out, 1, p, last, ctx.vocab.token_eot, row0=r)
                    if best is None:
                        still_failed.append(r)
                    else:
                        best["prompt"] = cur_prompts[r]
                        self._finish_window(st, best, si=batch[r])
                pending = still_failed
                self.phase_times["finish"] += _time.perf_counter() - _t0
            else:
                # candidate-tiled retry: each pending stream gets n_cand
                # consecutive slots of the SAME fixed-B compiled loop, its
                # window re-encoded into each (the resident-PCM slicer
                # tiles for free; otherwise the window is duplicated
                # host-side).  The previous rung's cross-KV is dropped
                # first — finished rows no longer need it, and holding two
                # full stacks is the q8 OOM hazard.  tiled_cache lets every
                # subsequent rung reuse the first retry rung's encoded
                # cross-KV (single-chunk layouts only — one stack alive)
                kc = vc = None
                pending = self._ladder_retry_tiled(
                    states, batch, pending, cur_prompts, t_cur, it, last,
                    n_cand, pcm_dev, tiled_cache)
        if self._dtw_jobs:
            # drop the ladder's cached cross-KV stack before the DTW pass
            # allocates its own re-decode buffers (two-stack OOM hazard)
            kc = vc = None
            tiled_cache.clear()
            self._run_dtw_jobs(states, pcm_dev)
        self.window_times.append((B, _time.perf_counter() - _t_iter))

    def _ladder_retry_tiled(self, states, batch, pending, cur_prompts,
                            t_cur, it, last, n_cand, pcm_dev,
                            tiled_cache: dict | None = None) -> list[int]:
        """Ladder rung with best_of > 1: decode n_cand multinomial
        candidates per pending stream inside the fixed-B batch and keep
        the best by sequence score — the reference's GREEDY best_of
        semantics (whisper.cpp:5718-5724) on the serving path.  Draw keys
        come from (seek, attempt, candidate), so results are bit-identical
        to the serial full() ladder.

        tiled_cache: single-chunk layouts are remembered across rungs —
        a stream that fails several temperatures keeps its slot group and
        the tiled cross-KV is encoded ONCE per window, not once per rung
        (groups whose stream already succeeded are simply masked dead).
        Draw keys are slot-position-independent, so reuse cannot change
        results.  Returns rows still failed."""
        import time as _time
        ctx = self.ctx
        p = self.params
        if n_cand > self.B:
            # best_of exceeds the batch: a stream's candidates span
            # several passes of the fixed-B loop (merged before ranking)
            return self._ladder_retry_multipass(
                states, batch, pending, cur_prompts, t_cur, it, last,
                n_cand, pcm_dev)
        groups_per_pass = max(1, self.B // n_cand)

        reuse = (tiled_cache is not None
                 and tiled_cache.get("n_cand") == n_cand
                 and set(pending) <= set(tiled_cache["layout"]))
        if reuse:
            chunks = [tiled_cache["layout"]]
        else:
            chunks = [pending[c0:c0 + groups_per_pass]
                      for c0 in range(0, len(pending), groups_per_pass)]

        still_failed: list[int] = []
        kc = vc = None
        for chunk in chunks:
            if reuse:
                kc, vc = tiled_cache["kv"]
            else:
                slot_streams: list = []
                for r in chunk:
                    slot_streams.extend([batch[r]] * n_cand)
                slot_streams.extend([None] * (self.B - len(slot_streams)))
                _t0 = _time.perf_counter()
                # drop the previous chunk's stack BEFORE encoding the next
                # one: two full q8 cross-KV stacks alive at once is the
                # 16 GB OOM transient (same hazard the round-2 iteration
                # fix closed for the greedy path)
                kc = vc = None
                kc, vc = self._encode_slots(states, slot_streams, pcm_dev)
                self.phase_times["encode"] += _time.perf_counter() - _t0
                if tiled_cache is not None and len(chunks) == 1:
                    # cache only single-chunk layouts: multiple cached
                    # stacks would multiply the q8 cross-KV footprint
                    tiled_cache.update(n_cand=n_cand, layout=list(chunk),
                                       kv=(kc, vc))

            prompts_t = [list(self.prompt_init) for _ in range(self.B)]
            live = np.zeros((self.B,), bool)
            seeks = np.zeros((self.B,), np.int32)
            ends = np.zeros((self.B,), np.int32)
            keys = np.zeros((self.B, 2), np.uint32)
            group_rows = []   # (group index, row) still pending this rung
            for g, r in enumerate(chunk):
                if r not in pending:
                    continue   # succeeded at an earlier rung: slots stay dead
                group_rows.append((g, r))
                st = states[batch[r]]
                s0 = g * n_cand
                group_keys = window_rng(st.seek, it, n_cand)
                for c in range(n_cand):
                    prompts_t[s0 + c] = cur_prompts[r]
                    live[s0 + c] = True
                    seeks[s0 + c] = st.seek
                    ends[s0 + c] = st.seek_end
                    keys[s0 + c] = group_keys[c]
            _t0 = _time.perf_counter()
            out = self._decode_rows(prompts_t, kc, vc, live, seeks, ends,
                                    t_cur, keys)
            self.phase_times["decode"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            for g, r in group_rows:
                st = states[batch[r]]
                best, _ = _rank_window_candidates(
                    out, n_cand, p, last, ctx.vocab.token_eot,
                    row0=g * n_cand)
                if best is None:
                    still_failed.append(r)
                else:
                    best["prompt"] = cur_prompts[r]
                    self._finish_window(st, best, si=batch[r])
            self.phase_times["finish"] += _time.perf_counter() - _t0
        return still_failed

    def _ladder_retry_multipass(self, states, batch, pending, cur_prompts,
                                t_cur, it, last, n_cand,
                                pcm_dev) -> list[int]:
        """Ladder rung for best_of > batch_size: one stream at a time, its
        n_cand candidates decoded B per pass (same draw keys the single-
        pass tiling would use — window_rng is keyed by candidate INDEX,
        not slot), then ranked across the merged pass results.  Keeps
        batch == serial bit-identical even when the batch is smaller than
        the reference's default best_of=5 (whisper.cpp:5718-5724)."""
        import time as _time
        ctx = self.ctx
        p = self.params
        still_failed: list[int] = []
        for r in pending:
            st = states[batch[r]]
            # every slot carries THIS stream's window; encoded once and
            # reused by every pass (all rows identical)
            _t0 = _time.perf_counter()
            kc, vc = self._encode_slots(
                states, [batch[r]] * self.B, pcm_dev)
            self.phase_times["encode"] += _time.perf_counter() - _t0
            group_keys = window_rng(st.seek, it, n_cand)
            outs = []
            for c0 in range(0, n_cand, self.B):
                cc = min(self.B, n_cand - c0)
                prompts_t = [cur_prompts[r] if c < cc
                             else list(self.prompt_init)
                             for c in range(self.B)]
                live = np.zeros((self.B,), bool)
                live[:cc] = True
                seeks = np.full((self.B,), st.seek, np.int32)
                ends = np.full((self.B,), st.seek_end, np.int32)
                keys = np.zeros((self.B, 2), np.uint32)
                keys[:cc] = group_keys[c0:c0 + cc]
                _t0 = _time.perf_counter()
                out = self._decode_rows(prompts_t, kc, vc, live, seeks,
                                        ends, t_cur, keys)
                self.phase_times["decode"] += _time.perf_counter() - _t0
                outs.append((out, cc))
            kc = vc = None
            _t0 = _time.perf_counter()
            merged = _merge_candidate_rows(outs)
            best, _ = _rank_window_candidates(
                merged, n_cand, p, last, ctx.vocab.token_eot, row0=0)
            if best is None:
                still_failed.append(r)
            else:
                best["prompt"] = cur_prompts[r]
                self._finish_window(st, best, si=batch[r])
            self.phase_times["finish"] += _time.perf_counter() - _t0
        return still_failed

    def _iterate_beam(self, states, batch, prompts, prompts_bare,
                      pcm_dev, _t_iter) -> None:
        """Beam-search window iteration: each pending stream decodes
        K = beam_size beams at t == 0 (best_of slots at t > 0, reference:
        whisper.cpp:5718-5724) through ONE jitted (S x K)-row batch —
        beam-5 requests ride the device batch instead of dropping to the
        serial per-window path (round-3 verdict ask #1b)."""
        import time as _time
        p = self.params
        B = len(batch)

        temps = [p.temperature]
        if p.temperature_inc > 0.0:
            t = p.temperature + p.temperature_inc
            while t < 1.0 + 1e-6:
                temps.append(t)
                t += p.temperature_inc

        self.n_windows += B
        pending = list(range(B))
        for it, t_cur in enumerate(temps):
            if not pending:
                break
            if it == 1:
                self.n_retried_windows += len(pending)
            last = it == len(temps) - 1
            cur_prompts = prompts if t_cur < 0.5 else prompts_bare
            # slot count per stream at this rung (serial: api._full_impl)
            K = (p.beam_search.beam_size if t_cur <= 0.0
                 else max(1, p.greedy.best_of))
            K = max(1, min(K, self.B))
            pending = self._beam_rung(states, batch, pending, cur_prompts,
                                      t_cur, it, last, K, pcm_dev)
        if self._dtw_jobs:
            self._run_dtw_jobs(states, pcm_dev)
        self.window_times.append((B, _time.perf_counter() - _t_iter))

    def _beam_rung(self, states, batch, pending, cur_prompts, t_cur, it,
                   last, K, pcm_dev) -> list[int]:
        """One beam ladder rung: chunks of S = B//K streams per device
        call, each stream spanning K beam rows.  Per-stream draw keys
        (window_rng(seek, attempt)) make results bit-identical to the
        serial beam path.  Returns rows still failed."""
        import time as _time
        ctx = self.ctx
        p = self.params
        S = max(1, self.B // K)
        still_failed: list[int] = []
        for c0 in range(0, len(pending), S):
            chunk = pending[c0:c0 + S]
            slot_streams = ([batch[r] for r in chunk]
                            + [None] * (S - len(chunk)))

            _t0 = _time.perf_counter()
            kc, vc = self._encode_slots(states, slot_streams, pcm_dev)
            self.phase_times["encode"] += _time.perf_counter() - _t0

            prompts_t = [list(self.prompt_init) for _ in range(S)]
            live = np.zeros((S,), bool)
            seeks = np.zeros((S,), np.int32)
            ends = np.zeros((S,), np.int32)
            keys = np.zeros((S, 2), np.uint32)
            for g, r in enumerate(chunk):
                st = states[batch[r]]
                prompts_t[g] = cur_prompts[r]
                live[g] = True
                seeks[g] = st.seek
                ends[g] = st.seek_end
                keys[g] = window_rng(st.seek, it, 1, per_row=False)
            _t0 = _time.perf_counter()
            out = self._decode_rows_beam(prompts_t, kc, vc, live, seeks,
                                         ends, t_cur, keys, K)
            self.phase_times["decode"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            for g, r in enumerate(chunk):
                st = states[batch[r]]
                best, _ = _rank_window_candidates(
                    out, K, p, last, ctx.vocab.token_eot, row0=g * K)
                if best is None:
                    still_failed.append(r)
                else:
                    best["prompt"] = cur_prompts[r]
                    self._finish_window(st, best, si=batch[r])
            self.phase_times["finish"] += _time.perf_counter() - _t0
        return still_failed

    def _decode_rows_beam(self, prompts, kc, vc, live, seeks, ends, t_cur,
                          keys, K):
        """Batched beam decode: prompts[s] against cross-KV row s, K beams
        per stream.  Inputs are per-stream (S rows); output arrays are
        per-beam (S*K rows), stream s at rows [s*K, (s+1)*K)."""
        ctx = self.ctx
        p = self.params
        S = len(prompts)
        P = self._prompt_bucket([q for s, q in enumerate(prompts)
                                 if live[s]] or [self.prompt_init])
        buf = np.zeros((S, P), np.int32)
        pad_len = np.full((S,), P - 1, np.int32)
        for row, q in enumerate(prompts):
            pad_len[row] = P - len(q)
            buf[row, P - len(q):] = q
        extra = (ctx._regex_suppress_ids(p.suppress_regex)
                 if p.suppress_regex else ())
        fn = ctx._beam_batch_window_fn(
            S, K, P, self.opts, p.single_segment, self.no_timestamps,
            p.max_tokens, extra)
        return fn(ctx.params, kc, vc, buf, pad_len, t_cur, seeks, ends,
                  keys, live)

    # rows per DTW cross-QK pass: the captured (L, B, S, T, Ta) f32 tensor
    # is the constraint (~100 MB/row at large-v3), not the decode itself
    DTW_QK_ROWS = 8

    def _run_dtw_jobs(self, states, pcm_dev=None) -> None:
        """Batched DTW token-timestamp pass over this iteration's finished
        windows: ONE teacher-forced cross-QK re-decode per chunk of rows
        (the serial path re-decodes per window,
        reference: whisper.cpp:6364-6378), then per-row host DTW."""
        jobs, self._dtw_jobs = self._dtw_jobs, []
        ctx = self.ctx
        p = self.params
        from ..dtw import (_dtw_qk_fn, dtw_aheads_select, dtw_pad_tokens,
                           dtw_stamp_segments, dtw_token_sequence)
        aheads, sel = dtw_aheads_select(ctx)
        if aheads is None:
            return
        sel_dev = jnp.asarray(sel)
        nB = max(1, min(self.B, self.DTW_QK_ROWS))
        for c0 in range(0, len(jobs), nB):
            chunk = jobs[c0:c0 + nB]
            seqs = []
            for (si, st, i_seg, n_new, seek_old, n_frames) in chunk:
                segs = st.result_all[i_seg:i_seg + n_new]
                toks, sot_len = dtw_token_sequence(ctx, p, segs)
                seqs.append((toks, sot_len, segs))
            # one shared token bucket per chunk -> one compiled fn
            T_pad = max(dtw_pad_tokens(ctx, toks)[1] for toks, _, _ in seqs)
            toks_arr = np.full((nB, T_pad), ctx.vocab.token_eot, np.int32)
            for r, (toks, _, _) in enumerate(seqs):
                toks_arr[r, :min(len(toks), T_pad)] = toks[:T_pad]

            slot_streams = [si for (si, *_rest) in chunk]
            slot_streams += [None] * (nB - len(slot_streams))
            seeks = np.zeros((nB,), np.int64)
            for r, (_, _, _, _, seek_old, _) in enumerate(chunk):
                seeks[r] = seek_old
            kc, vc = self._encode_slots(states, slot_streams, pcm_dev,
                                        seeks=seeks)
            # quantized (codes, scales) pairs pass through untagged —
            # _dtw_qk_fn tags them at trace time inside the jit
            run = _dtw_qk_fn(ctx, nB, T_pad, sel.shape)
            qk = np.asarray(run(ctx.params, jnp.asarray(toks_arr), kc, vc,
                                sel_dev))      # (L, nB, S, T_pad, Ta)
            for r, ((_, _, _, _, seek_old, n_frames),
                    (toks, sot_len, segs)) in enumerate(zip(chunk, seqs)):
                dtw_stamp_segments(ctx, qk[:, r], aheads,
                                   min(len(toks), T_pad), sot_len,
                                   seek_old, n_frames, segs)

    def _encode_slots(self, states, slot_streams, pcm_dev=None,
                      seeks=None):
        """Batched encode where slot i carries stream slot_streams[i]'s
        current window (None = dead slot, zeros).  Duplicate entries are
        how the ladder tiles best_of candidates per stream — the
        resident-PCM path gathers the same window twice at no extra cost.
        The encode batch size is len(slot_streams): callers pad to their
        fixed slot count (self.B for greedy, streams-per-pass for beam) so
        each geometry compiles exactly once."""
        ctx = self.ctx
        n_ctx = ctx.hparams.n_audio_ctx
        nB = len(slot_streams)
        if pcm_dev is not None:
            from ..constants import HOP_LENGTH
            rows_idx = np.zeros((nB,), np.int32)
            starts = np.zeros((nB,), np.int32)
            for row, si in enumerate(slot_streams):
                if si is None:
                    continue
                # streams carrying an explicit pool row (continuous
                # batching's slot-pinned resident pool) index pcm_dev by
                # that row; transcribe()'s stacked upload indexes by the
                # state's own position
                pr = getattr(states[si], "pcm_row", None)
                rows_idx[row] = si if pr is None else pr
                starts[row] = (seeks[row] if seeks is not None
                               else states[si].seek) * HOP_LENGTH
            return self._encode_batch_sliced(pcm_dev, rows_idx, starts)
        if self.device_mel:
            from ..constants import HOP_LENGTH, N_FFT
            S = 2 * n_ctx * HOP_LENGTH + N_FFT
            all_i16 = all(states[si].pcm_padded.dtype == np.int16
                          for si in slot_streams if si is not None)
            mel_windows = np.zeros(
                (nB, S), np.int16 if all_i16 else np.float32)
            for row, si in enumerate(slot_streams):
                if si is None:
                    continue
                st = states[si]
                start = (seeks[row] if seeks is not None
                         else st.seek) * HOP_LENGTH
                chunk = st.pcm_padded[start:start + S]
                if (chunk.dtype == np.int16
                        and mel_windows.dtype != np.int16):
                    chunk = chunk.astype(np.float32) / 32768.0
                mel_windows[row, :len(chunk)] = chunk
        else:
            mel_windows = np.zeros((nB, 2 * n_ctx, ctx.hparams.n_mels),
                                   np.float32)
            for row, si in enumerate(slot_streams):
                if si is None:
                    continue
                st = states[si]
                sk = seeks[row] if seeks is not None else st.seek
                avail = max(0, min(2 * n_ctx, st.mel.shape[0] - sk))
                mel_windows[row, :avail] = st.mel[sk:sk + avail]
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from .mesh import batch_spec
            mel_windows = jax.device_put(
                jnp.asarray(mel_windows),
                NamedSharding(self.mesh, batch_spec(self.mesh)))
        return self._encode_batch(mel_windows)

    def _prompt_bucket(self, prompts) -> int:
        """Fixed prompt-buffer size: one small bucket for bare prompts, one
        carried-past bucket sized by how much past the params allow.  A
        small n_max_text_ctx therefore shrinks the whole decode KV (C =
        P + N + 1) instead of paying the full n_text_ctx//2 buffer."""
        if max(len(q) for q in prompts) <= 8:
            return 8
        cap = min(self.params.n_max_text_ctx, self.ctx.hparams.n_text_ctx // 2)
        need = 1 + cap + len(self.prompt_init)   # token_prev + past + init
        return max(8, (need + 7) // 8 * 8)

    def _decode_rows(self, prompts, kc, vc, live, seeks, ends, t_cur, keys):
        """Decode `prompts[r]` against cross-KV row r for every live row.

        Rows stay in their natural batch positions — no cross-KV gather
        (an eager take on the q8 stack would transiently double ~8 GB at
        large-v3 B=48+ and OOM the chip); dead rows decode their own
        (masked, ignored) window.  Output row r corresponds to prompts[r].

        keys: (B, 2) uint32 per-row draw keys (window_rng) — each row's
        multinomial stream is independent of its slot position, so the
        ladder's retry draws match the serial path bit-for-bit.  All
        inputs ride _PackedWindowFn's single blob upload; results come
        back as numpy in one fetch.
        """
        ctx = self.ctx
        p = self.params
        B = self.B
        assert len(prompts) == B
        P = self._prompt_bucket([q for r, q in enumerate(prompts)
                                 if live[r]] or [self.prompt_init])
        buf = np.zeros((B, P), np.int32)
        pad_len = np.full((B,), P - 1, np.int32)
        for row, q in enumerate(prompts):
            pad_len[row] = P - len(q)
            buf[row, P - len(q):] = q
        fn = ctx._decode_window_fn(
            B, P, self.opts, p.single_segment, self.no_timestamps,
            p.max_tokens, "greedy", per_row_rng=True)
        return fn(ctx.params, kc, vc, buf, pad_len, t_cur, seeks, ends,
                  keys, live)

    def warmup(self, pcm_dtype=np.float32) -> None:
        """Pre-compile the encoder and both prompt-bucket decode variants
        so a serving process never jit-compiles on a live request.
        pcm_dtype: np.int16 when the streams will arrive as packed s16le
        (device_mel only) — the encoder jit specializes on input dtype."""
        ctx = self.ctx
        n_ctx = ctx.hparams.n_audio_ctx
        if self.device_mel:
            from ..constants import HOP_LENGTH, N_FFT
            mel = np.zeros((self.B, 2 * n_ctx * HOP_LENGTH + N_FFT),
                           pcm_dtype)
        else:
            mel = np.zeros((self.B, 2 * n_ctx, ctx.hparams.n_mels),
                           np.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from .mesh import batch_spec
            mel = jax.device_put(jnp.asarray(mel),
                                 NamedSharding(self.mesh, batch_spec(self.mesh)))
        kc, vc = self._encode_batch(mel)
        bare = list(self.prompt_init)
        cap = min(self.params.n_max_text_ctx, ctx.hparams.n_text_ctx // 2)
        carried = [ctx.vocab.token_prev] + [0] * cap + bare
        live = np.zeros((self.B,), bool)
        live[0] = True
        zeros = np.zeros((self.B,), np.int32)
        keys = np.zeros((self.B, 2), np.uint32)
        for prompt in (bare, carried):
            out = self._decode_rows([prompt] * self.B, kc, vc, live,
                                    zeros, zeros, 0.0, keys)
            del out
        if self.auto_lang:
            jax.block_until_ready(self._detect_fn()(ctx.params, kc, vc))

    def _finish_window(self, st: StreamState, best: dict,
                       si: int | None = None) -> None:
        """Emit one window's winning candidate into the stream's session
        state and advance its seek (best: _rank_window_candidates output
        plus "prompt") — identical emission to the serial path.

        si: the stream's index into this iteration's `states` list — used
        to queue the window for the batched DTW pass when the context has
        dtw_token_timestamps on."""
        ctx = self.ctx
        p = self.params
        st.no_speech_prob = best["no_speech_prob"]
        seek_old = st.seek

        if ctx.n_loaded == 0:
            st.seek += TICKS_PER_SECOND * CHUNK_SIZE
        else:
            n_seg_before = len(st.result_all)
            with ctx.use_state(st):
                ctx.no_speech_prob = st.no_speech_prob
                st.seek = ctx._emit_segments(best, st.seek, st.seek_end, p,
                                             st.prompt_init
                                             or self.prompt_init,
                                             self.no_timestamps)
            n_new = len(st.result_all) - n_seg_before
            if ctx.dtw_token_timestamps and n_new and si is not None:
                # deferred: the iteration's finished windows share one
                # batched cross-QK re-decode (reference per-window pass:
                # whisper.cpp:6364-6378)
                n_frames = min(TICKS_PER_SECOND * CHUNK_SIZE,
                               best["seek_delta"], st.seek_end - seek_old)
                self._dtw_jobs.append(
                    (si, st, n_seg_before, n_new, seek_old, n_frames))

        if st.seek + DELTA_MIN >= st.seek_end:
            st.done = True
        if st.seek > 0 and st.seek + 500 >= st.seek_end:
            st.prompt_past = []


class _Job:
    """One submitted stream riding the continuous batch."""

    __slots__ = ("pcm", "st", "done", "error", "t_submit", "t_first_segment",
                 "t_done", "iter_joined", "iter_done", "iter_first",
                 "_had_segment", "on_segment", "_n_emitted", "_last_sched")

    def __init__(self, pcm, on_segment=None):
        import threading
        import time
        self.pcm = pcm
        self.st: StreamState | None = None
        self.done = threading.Event()
        self.error: str | None = None
        self.t_submit = time.perf_counter()
        self.t_first_segment: float | None = None
        self.t_done: float | None = None
        self.iter_joined: int | None = None
        self.iter_done: int | None = None
        self.iter_first: int | None = None   # iteration of first segment
        self._had_segment = False
        # streaming: called with each finalized Segment as the engine
        # produces it (between window iterations) — from the SCHEDULER
        # thread, so callbacks must be quick and must not raise
        self.on_segment = on_segment
        self._n_emitted = 0
        # iteration index of the last slot this job held; -1 = never
        # scheduled (drives first-window-first + round-robin scheduling)
        self._last_sched = -1


class ContinuousBatcher:
    """Continuous batching: a persistent device batch whose rows are
    REFILLED between window iterations.

    The plain BatchTranscriber (and the reference server, which runs one
    request at a time against one whisper_context,
    reference: examples/server/server.cpp:694) admits work only at batch
    boundaries: a long stream head-of-line-blocks every later request
    until the whole group drains.  Here the scheduler re-picks the batch
    BEFORE EVERY window iteration — finished streams free their slot
    immediately and queued/new requests join mid-flight, so a request
    arriving while a long batch is decoding produces its first segment
    within about one window iteration.

    Scheduling is first-window-first, then round-robin: never-scheduled
    streams take slots before in-flight ones (so TTFS is bounded by
    ~(queue position / batch_size) iterations, not by draining what is
    ahead), and in-flight streams rotate least-recently-scheduled-first
    so every live stream makes steady per-window progress.  Admission is
    just-in-time (at most one iteration's worth of fresh preps per
    cycle), and admitted streams pin their PCM to a device-resident pool
    row so windows are cut on-device instead of re-uploaded per
    iteration.
    """

    def __init__(self, ctx: WhisperContext, batch_size: int = 8,
                 params: FullParams | None = None, device_mel: bool = False,
                 max_active: int | None = None, warmup: bool = False):
        import queue
        import threading

        self.bt = BatchTranscriber(ctx, batch_size=batch_size, params=params,
                                   device_mel=device_mel)
        if warmup:
            self.bt.warmup()
        self.B = batch_size
        # admission cap: streams beyond it wait in the queue un-prepped
        # (each admitted stream holds its mel spectrogram in host memory)
        self.max_active = max_active or 2 * batch_size
        # slot-pinned resident-PCM pool: each admitted stream's padded PCM
        # is uploaded ONCE into its pool row and windows are cut on-device
        # (_encode_batch_sliced), instead of re-uploading every active
        # row's 30 s window every iteration (~2 MB/row/iteration).  Rows
        # are recycled when streams finish.  device_mel-only, like
        # transcribe()'s stacked upload.
        self._pool = None
        self._pool_len = 0
        self._pool_dtype = None
        self._pool_free = list(range(self.max_active))
        self._pool_setters: dict = {}
        # per-row high-water mark: a recycled row whose new stream is
        # shorter re-uploads up to the previous occupant's extent, so a
        # stale tail can never be read even if seek_end overruns the audio
        # (duration_ms beyond the file decodes silence, not old samples)
        self._pool_water = [0] * self.max_active
        self.queue: "queue.Queue[_Job]" = queue.Queue()
        self.active: list[_Job] = []
        self.n_iterations = 0
        # instrumentation: called as iteration_hook(n_iterations) at the
        # top of every scheduler cycle, BEFORE admission — lets tests and
        # metrics collectors observe (or deterministically pause) the
        # engine between iterations
        self.iteration_hook = None
        self._closed = False
        self._lock = threading.Lock()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    # -- client side -------------------------------------------------------

    def submit(self, pcm) -> list[Segment]:
        """Blocks until this stream finishes; returns its segments.
        Thread-safe; any number of callers may submit concurrently."""
        if self._closed:
            raise RuntimeError("ContinuousBatcher is closed")
        job = _Job(pcm)
        self.queue.put(job)
        job.done.wait()
        if job.error is not None:
            raise RuntimeError(job.error)
        return job.st.result_all

    def submit_async(self, pcm, on_segment=None) -> _Job:
        """Non-blocking submit; wait on job.done, read job.st.result_all.
        The job also records time-to-first-segment (t_first_segment) and
        the iteration indices it joined/finished at.

        on_segment: optional callable(Segment) invoked for each finalized
        segment as the engine produces it (the server's SSE /stream
        endpoint rides this); called from the scheduler thread."""
        job = _Job(pcm, on_segment=on_segment)
        self.queue.put(job)
        return job

    def close(self) -> None:
        self._closed = True
        self.queue.put(None)   # wake the engine
        self.thread.join(timeout=30)

    # -- engine ------------------------------------------------------------

    # pool budget: rows x row-length never exceeds this many bytes (the
    # pool shares HBM with the weights, cross-KV and decode caches)
    POOL_BYTES = 1 << 30

    def _pool_admit(self, st: StreamState) -> None:
        """Pin `st`'s padded PCM to a free pool row (one h2d upload for the
        stream's whole life).  Declines — leaving the stream on the
        upload-per-iteration fallback — when the pool is full, the dtype
        differs from the pool's, or the stream would blow the byte budget.
        Pool growth doubles the row length so the sliced-encode fn
        recompiles only O(log max_len) times."""
        arr = getattr(st, "pcm_padded", None)
        if arr is None or not self._pool_free:
            return
        if self._pool_dtype is None:
            self._pool_dtype = arr.dtype
        if arr.dtype != self._pool_dtype:
            return
        gran = 16000 * CHUNK_SIZE            # 30 s of samples
        plen = max(self._pool_len, 2 * gran)
        while plen < len(arr):
            plen *= 2
        if self.max_active * plen * arr.itemsize > self.POOL_BYTES:
            return
        if self._pool is None or plen > self._pool_len:
            old, old_len = self._pool, self._pool_len
            self._pool = jnp.zeros((self.max_active, plen),
                                   self._pool_dtype)
            if old is not None:
                self._pool = self._pool.at[:, :old_len].set(old)
            self._pool_len = plen
        row = self._pool_free.pop()
        # upload only the stream's own bytes (bucketed to 30 s), not the
        # whole row: window reads never pass len(arr) (pad_audio's 30 s +
        # N_FFT tail covers the last window exactly), so the recycled
        # row's stale tail beyond ulen is never touched
        ulen = min(self._pool_len,
                   max(-(-len(arr) // gran) * gran, self._pool_water[row]))
        self._pool_water[row] = ulen
        key = (self._pool.shape, str(self._pool.dtype), ulen)
        setter = self._pool_setters.get(key)
        if setter is None:
            # donate the pool so the row write is in-place, not a copy
            setter = jax.jit(
                lambda pool, data, r: jax.lax.dynamic_update_slice(
                    pool, data[None], (r, 0)),
                donate_argnums=(0,))
            self._pool_setters[key] = setter
        host_row = np.zeros((ulen,), self._pool_dtype)
        host_row[:len(arr)] = arr
        self._pool = setter(self._pool, jnp.asarray(host_row),
                            np.int32(row))
        st.pcm_row = row

    def _pool_release(self, st: StreamState) -> None:
        row = getattr(st, "pcm_row", None)
        if row is not None:
            st.pcm_row = None
            self._pool_free.append(row)

    def _admit(self, job: "_Job | None") -> None:
        import time
        if job is None:
            return
        try:
            job.st = self.bt._make_stream(job.pcm)
            job.pcm = None          # the mel/padded-pcm is what's needed now
            job.iter_joined = self.n_iterations
        except Exception as e:  # noqa: BLE001 — fail this job, not the engine
            job.error = f"stream prep failed: {e}"
            job.done.set()
            return
        if job.st.done:             # too short to decode: resolve instantly
            job.t_done = time.perf_counter()
            job.iter_done = self.n_iterations
            job.done.set()
            return
        if self.bt.device_mel and self.bt.mesh is None:
            try:
                self._pool_admit(job.st)
            except Exception:  # noqa: BLE001 — pool is an optimization;
                job.st.pcm_row = None   # the upload path still works
        self.active.append(job)

    def _run(self):
        import queue as _q
        import time

        while True:
            hook = self.iteration_hook
            if hook is not None:
                hook(self.n_iterations)
            # admit new work: block when idle, drain when busy
            if not self.active:
                try:
                    job = self.queue.get(timeout=0.25)
                except _q.Empty:
                    if self._closed:
                        break
                    continue
                if job is None and self._closed:
                    break
                self._admit(job)
            while len(self.active) < self.max_active:
                # just-in-time admission: prep (and pool-upload) at most
                # one iteration's worth of never-scheduled streams per
                # cycle — a bulk submission of max_active streams must not
                # stall the first batch behind everyone's prep; later
                # waves prep on later cycles, right before their slots
                if sum(1 for j in self.active
                       if j._last_sched < 0) >= self.B:
                    break
                try:
                    job = self.queue.get_nowait()
                except _q.Empty:
                    break
                if job is None and self._closed:
                    break
                self._admit(job)
            if self._closed and not self.active:
                break
            if not self.active:
                continue

            # First-window-first + round-robin: streams that have never
            # held a slot get this iteration's slots before in-flight
            # streams (FIFO within the fresh class), and in-flight streams
            # rotate least-recently-scheduled-first.  Every stream still
            # decodes the same windows, so steady-state throughput is
            # unchanged — only the ORDER changes: a request's
            # time-to-first-segment is bounded by ~(queue position / B)
            # iterations instead of by the FULL DRAIN of every stream
            # admitted before it (under plain FIFO, a second wave of
            # equal-length streams gets its first slot only when the first
            # wave finishes its last window), and after the first window
            # every live stream makes steady progress (segments trickle
            # per stream — what the SSE /stream clients see) instead of
            # the oldest stream hogging the batch.  Starvation is bounded:
            # fresh admissions are capped at B per cycle, and a scheduled
            # stream re-enters the rotation like everyone else.
            fresh = [i for i, j in enumerate(self.active)
                     if j._last_sched < 0]
            inflight = sorted(
                (i for i, j in enumerate(self.active)
                 if j._last_sched >= 0),
                key=lambda i: self.active[i]._last_sched)
            batch = (fresh + inflight)[:min(len(self.active), self.B)]
            for i in batch:
                self.active[i]._last_sched = self.n_iterations
            # resident-pool fast path only when every scheduled stream is
            # pinned (mixed batches fall back to the window upload — rare:
            # pool exhaustion, dtype mismatch, or an over-budget stream)
            sts = [j.st for j in self.active]
            pcm_dev = (self._pool if self._pool is not None and all(
                getattr(sts[i], "pcm_row", None) is not None
                for i in batch) else None)
            try:
                self.bt._iterate(sts, batch, pcm_dev)
            except Exception as e:  # noqa: BLE001 — a dead engine thread
                # would leave every submitter blocked on done.wait() forever
                for j in self.active:
                    j.error = f"batch iteration failed: {e}"
                    j.done.set()
                    self._pool_release(j.st)
                self.active.clear()
                continue
            self.n_iterations += 1

            now = time.perf_counter()
            still = []
            for idx, j in enumerate(self.active):
                if (not j._had_segment and idx in batch
                        and j.st.result_all):
                    j._had_segment = True
                    j.t_first_segment = now
                    j.iter_first = self.n_iterations
                if j.on_segment is not None:
                    segs = j.st.result_all
                    while j._n_emitted < len(segs):
                        try:
                            j.on_segment(segs[j._n_emitted])
                        except Exception:  # noqa: BLE001 — a client's
                            pass           # callback must not kill the engine
                        j._n_emitted += 1
                if j.st.done:
                    j.t_done = now
                    j.iter_done = self.n_iterations
                    self._pool_release(j.st)
                    j.done.set()
                else:
                    still.append(j)
            self.active = still

        # drain anything still queued after close
        while True:
            try:
                job = self.queue.get_nowait()
            except _q.Empty:
                break
            if job is not None:
                job.error = "ContinuousBatcher closed"
                job.done.set()




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
                   full_default_params)
from ..audio.mel import log_mel_spectrogram
from ..constants import CHUNK_SIZE, TICKS_PER_SECOND
from ..decode.filters import FilterOptions
from ..languages import lang_id as _lang_id

DELTA_MIN = 10


class StreamState(WhisperState):
    """Per-stream sliding-window session: a WhisperState plus window
    scheduling fields."""

    def __init__(self, mel, seek, seek_end):
        super().__init__()
        self.mel = mel
        self.seek = seek
        self.seek_end = seek_end
        self.done = False


class BatchTranscriber:
    """Transcribe many audio streams concurrently on one (or more) chips."""

    def __init__(self, ctx: WhisperContext, batch_size: int = 8,
                 params: FullParams | None = None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a "data" axis — windows are
        sharded over it (and params over its "model" axis if >1), scaling
        serving across chips via ICI (the reference's whisper_full_parallel
        / ggml-rpc role, SURVEY §2.6)."""
        self.ctx = ctx
        self.B = batch_size
        self.mesh = mesh
        if mesh is not None:
            from .mesh import shard_params
            n_data = mesh.shape["data"]
            assert batch_size % n_data == 0, \
                f"batch_size {batch_size} must divide over data={n_data}"
            ctx.params = shard_params(ctx.params, mesh)
            ctx.mesh = mesh   # _decode_window_fn pins explicit in_shardings
        self.params = params or full_default_params()
        p = self.params
        if p.language in (None, "", "auto") or p.detect_language:
            raise ValueError(
                "batched transcription needs an explicit language "
                "(per-stream auto-detect would desynchronize the batch)")
        self.no_timestamps = p.no_timestamps
        self.opts = FilterOptions(
            suppress_blank=p.suppress_blank,
            no_timestamps=p.no_timestamps,
            tdrz_enable=p.tdrz_enable,
            suppress_nst=p.suppress_nst,
            max_initial_ts=p.max_initial_ts,
        )
        self.prompt_init = [ctx.vocab.token_sot]
        if ctx.vocab.is_multilingual:
            lid = _lang_id(p.language)
            self.prompt_init.append(ctx.vocab.token_lang(lid))
            self.prompt_init.append(
                ctx.vocab.token_translate if p.translate
                else ctx.vocab.token_transcribe)
        if p.no_timestamps:
            self.prompt_init.append(ctx.vocab.token_not)

    # -- jitted batched encode -------------------------------------------

    def _encode_batch(self, mel_windows):
        key = ("enc_batch", tuple(mel_windows.shape))
        if key not in self.ctx._jit_cache:
            from ..models import whisper as wm
            nh_a, nh_t = (self.ctx.config.n_audio_head,
                          self.ctx.config.n_text_head)
            cd = self.ctx.compute_dtype

            @jax.jit
            def run(params, mel):
                enc = wm.encode(params, mel, n_head=nh_a, compute_dtype=cd)
                return wm.cross_kv(params, enc, n_head=nh_t, compute_dtype=cd)

            self.ctx._jit_cache[key] = run
        return self.ctx._jit_cache[key](self.ctx.params,
                                        jnp.asarray(mel_windows))

    # -- main driver -------------------------------------------------------

    def transcribe(self, streams: list[np.ndarray]) -> list[list[Segment]]:
        """-> per-stream segment lists."""
        ctx = self.ctx
        p = self.params
        states = []
        for pcm in streams:
            mel, n_len_org = log_mel_spectrogram(
                np.asarray(pcm, np.float32), ctx.filters)
            states.append(StreamState(
                mel=mel, seek=p.offset_ms // 10,
                seek_end=(n_len_org if p.duration_ms == 0
                          else p.offset_ms // 10 + p.duration_ms // 10)))
        for st in states:
            if st.seek_end < st.seek + DELTA_MIN:
                st.done = True

        n_ctx = ctx.hparams.n_audio_ctx
        n_mels = ctx.hparams.n_mels

        # per-iteration wall times (n_windows, seconds) — one iteration is
        # one batched encode + decode ladder, i.e. the latency a window
        # experiences; bench.py reports p50/p99 from this
        self.window_times: list[tuple[int, float]] = []
        import time as _time

        while True:
            active = [i for i, st in enumerate(states) if not st.done]
            if not active:
                break
            _t_iter = _time.perf_counter()
            batch = active[:self.B]
            B = len(batch)

            # every device call is padded to the FIXED batch size self.B —
            # partial tail batches and fallback rebatches reuse one compiled
            # loop instead of compiling per subset size (dead rows are
            # masked via row_live and start completed)
            mel_windows = np.zeros((self.B, 2 * n_ctx, n_mels), np.float32)
            prompts = []        # with carried past (used while t < 0.5)
            prompts_bare = []   # prompt_init only (hot retries,
                                # reference: whisper.cpp:5763 t_cur<0.5 gate)
            for row, i in enumerate(batch):
                st = states[i]
                avail = max(0, min(2 * n_ctx, st.mel.shape[0] - st.seek))
                mel_windows[row, :avail] = st.mel[st.seek:st.seek + avail]
                prompt = []
                if st.prompt_past and p.n_max_text_ctx > 0:
                    n_take = min(p.n_max_text_ctx,
                                 ctx.hparams.n_text_ctx // 2,
                                 len(st.prompt_past))
                    prompt = [ctx.vocab.token_prev] + st.prompt_past[-n_take:]
                prompts.append(prompt + self.prompt_init)
                prompts_bare.append(list(self.prompt_init))

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                mel_windows = jax.device_put(
                    jnp.asarray(mel_windows),
                    NamedSharding(self.mesh, P("data")))
            kc, vc = self._encode_batch(mel_windows)

            # temperature-fallback ladder, rebatching only the failed rows
            # (reference per-decoder ladder: src/whisper.cpp:5706-6230)
            temps = [p.temperature]
            if p.temperature_inc > 0.0:
                t = p.temperature + p.temperature_inc
                while t < 1.0 + 1e-6:
                    temps.append(t)
                    t += p.temperature_inc

            pending = list(range(B))   # row indices into the original batch
            for it, t_cur in enumerate(temps):
                if not pending:
                    break
                cur_prompts = prompts if t_cur < 0.5 else prompts_bare
                out = self._decode_rows(
                    [cur_prompts[r] for r in pending],
                    kc, vc, pending,
                    np.asarray([states[batch[r]].seek for r in pending]),
                    np.asarray([states[batch[r]].seek_end for r in pending]),
                    t_cur)
                still_failed = []
                for j, r in enumerate(pending):
                    st = states[batch[r]]
                    ok = self._row_success(out, j, t_cur,
                                           last=(it == len(temps) - 1))
                    if ok:
                        self._finish_window(st, out, j, int(out["n_tokens"]),
                                            cur_prompts[r])
                    else:
                        still_failed.append(r)
                pending = still_failed
            self.window_times.append((B, _time.perf_counter() - _t_iter))

        return [st.result_all for st in states]

    def _prompt_bucket(self, prompts) -> int:
        return 8 if max(len(q) for q in prompts) <= 8 else (
            self.ctx.hparams.n_text_ctx // 2 + 8)

    def _decode_rows(self, prompts, kc, vc, rows, seeks, ends, t_cur):
        """Decode `prompts[j]` against cross-KV rows `rows[j]`, padded to
        the fixed batch; output row j corresponds to prompts[j]."""
        ctx = self.ctx
        p = self.params
        n_live = len(prompts)
        B = self.B
        P = self._prompt_bucket(prompts)
        buf = np.zeros((B, P), np.int32)
        pad_len = np.full((B,), P - 1, np.int32)
        for row, q in enumerate(prompts):
            pad_len[row] = P - len(q)
            buf[row, P - len(q):] = q
        # gather live rows to the front; dead slots replay row 0's KV (any
        # valid data works — they start completed and are never read back)
        idx = list(rows) + [rows[0] if rows else 0] * (B - n_live)
        if n_live < B or list(rows) != list(range(B)):
            gather = jnp.asarray(idx)
            kc = jnp.take(kc, gather, axis=1)
            vc = jnp.take(vc, gather, axis=1)
        live = np.zeros((B,), bool)
        live[:n_live] = True
        seeks_p = np.zeros((B,), np.int32)
        ends_p = np.zeros((B,), np.int32)
        seeks_p[:n_live] = seeks
        ends_p[:n_live] = ends
        fn = ctx._decode_window_fn(
            B, P, self.opts, p.single_segment, self.no_timestamps,
            p.max_tokens, "greedy")
        out = fn(ctx.params, kc, vc, jnp.asarray(buf), jnp.asarray(pad_len),
                 jnp.float32(t_cur), jnp.asarray(seeks_p),
                 jnp.asarray(ends_p), jax.random.PRNGKey(int(t_cur * 100)),
                 jnp.asarray(live))
        return jax.tree_util.tree_map(np.asarray, out)

    def warmup(self) -> None:
        """Pre-compile the encoder and both prompt-bucket decode variants
        so a serving process never jit-compiles on a live request."""
        ctx = self.ctx
        n_ctx = ctx.hparams.n_audio_ctx
        mel = np.zeros((self.B, 2 * n_ctx, ctx.hparams.n_mels), np.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            mel = jax.device_put(jnp.asarray(mel),
                                 NamedSharding(self.mesh, P("data")))
        kc, vc = self._encode_batch(mel)
        bare = list(self.prompt_init)
        carried = ([ctx.vocab.token_prev]
                   + [0] * (ctx.hparams.n_text_ctx // 2 - 1) + bare)
        for prompt in (bare, carried):
            out = self._decode_rows([prompt], kc, vc, [0],
                                    np.asarray([0]), np.asarray([0]), 0.0)
            del out

    def _row_success(self, out, j, t_cur, last: bool) -> bool:
        """Per-stream fallback criteria (reference: whisper.cpp:6169-6230)."""
        p = self.params
        if last:
            return True
        if bool(out["failed"][j]):
            return False
        rl = int(out["result_len"][j])
        plogs = out["plog"][j][:rl]
        avg_lp = float(plogs.sum()) / max(rl, 1) if rl else -np.inf
        if rl > 32:
            ids, counts = np.unique(out["tokens"][j][max(0, rl - 32):rl],
                                    return_counts=True)
            ps = counts / counts.sum()
            entropy = float(-(ps * np.log(ps)).sum())
            if entropy < p.entropy_thold:
                return False
        nsp = float(out["no_speech_prob"][j])
        if avg_lp < p.logprob_thold and nsp < p.no_speech_thold:
            return False
        return True

    def _finish_window(self, st: StreamState, out, row: int,
                       n_sampled: int, prompt: list) -> None:
        ctx = self.ctx
        p = self.params
        failed = bool(out["failed"][row])
        result_len = int(out["result_len"][row])
        seek_delta = int(out["seek_delta"][row])
        st.no_speech_prob = float(out["no_speech_prob"][row])

        if ctx.n_loaded == 0:
            st.seek += TICKS_PER_SECOND * CHUNK_SIZE
        else:
            # emission truncates to result_len (whisper.cpp:6180); a
            # loop-failed row reaching the final temperature keeps its full
            # sampled sequence, exactly like the serial path
            best = {
                "tokens": out["tokens"][row], "p": out["p"][row],
                "plog": out["plog"][row], "tid": out["tid"][row],
                "pt": out["pt"][row], "ptsum": out["ptsum"][row],
                "result_len": result_len,
                "n_emit": n_sampled if failed else result_len,
                "seek_delta": seek_delta,
                "avg_logprobs": (float(out["plog"][row][:result_len].sum())
                                 / max(result_len, 1)),
                "prompt": prompt,
            }
            with ctx.use_state(st):
                ctx.no_speech_prob = st.no_speech_prob
                st.seek = ctx._emit_segments(best, st.seek, st.seek_end, p,
                                             self.prompt_init,
                                             self.no_timestamps)

        if st.seek + DELTA_MIN >= st.seek_end:
            st.done = True
        if st.seek > 0 and st.seek + 500 >= st.seek_end:
            st.prompt_past = []




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

    def _encode_batch_sliced(self, pcm_all, rows, starts):
        """Device-resident variant: streams' padded PCM lives on the device
        (uploaded once); per iteration only (B,) row indices and sample
        offsets cross the host boundary and windows are cut with
        dynamic_slice inside the jit — kills the ~2 MB/window/iteration
        host->device transfer of the upload-per-iteration path."""
        from ..constants import HOP_LENGTH, N_FFT
        key = ("enc_batch_sliced", tuple(pcm_all.shape), str(pcm_all.dtype),
               self.B, self.ctx.cross_mode)
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

    def transcribe(self, streams: list[np.ndarray]) -> list[list[Segment]]:
        """-> per-stream segment lists."""
        ctx = self.ctx
        p = self.params
        states = []

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

        for pcm in streams:
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
                states.append(_with_energy(st, pcm))
                continue
            mel, n_len_org = log_mel_spectrogram(
                np.asarray(pcm), ctx.filters)
            states.append(_with_energy(StreamState(
                mel=mel, seek=p.offset_ms // 10,
                seek_end=(n_len_org if p.duration_ms == 0
                          else p.offset_ms // 10 + p.duration_ms // 10)),
                pcm))
        for st in states:
            if st.seek_end < st.seek + DELTA_MIN:
                st.done = True

        # device_mel: keep every stream's padded PCM resident on the device
        # (one upload) and cut windows on-device, unless the total is large
        # or a mesh is attached (resident gathers would cross shards)
        import time as _time
        self.phase_times: dict[str, float] = {
            "upload": 0.0, "prep": 0.0, "encode": 0.0, "decode": 0.0,
            "finish": 0.0}
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

        n_ctx = ctx.hparams.n_audio_ctx
        n_mels = ctx.hparams.n_mels

        # per-iteration wall times (n_windows, seconds) — one iteration is
        # one batched encode + decode ladder, i.e. the latency a window
        # experiences; bench.py reports p50/p99 from this
        self.window_times: list[tuple[int, float]] = []

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
            if pcm_dev is not None:
                from ..constants import HOP_LENGTH
                mel_windows = None
                rows_idx = np.zeros((self.B,), np.int32)
                starts = np.zeros((self.B,), np.int32)
                for row, i in enumerate(batch):
                    rows_idx[row] = i
                    starts[row] = states[i].seek * HOP_LENGTH
            elif self.device_mel:
                from ..constants import HOP_LENGTH, N_FFT
                S = 2 * n_ctx * HOP_LENGTH + N_FFT
                all_i16 = all(states[i].pcm_padded.dtype == np.int16
                              for i in batch)
                mel_windows = np.zeros(
                    (self.B, S), np.int16 if all_i16 else np.float32)
            else:
                mel_windows = np.zeros((self.B, 2 * n_ctx, n_mels),
                                       np.float32)
            prompts = []        # with carried past (used while t < 0.5)
            prompts_bare = []   # prompt_init only (hot retries,
                                # reference: whisper.cpp:5763 t_cur<0.5 gate)
            for row, i in enumerate(batch):
                st = states[i]
                if pcm_dev is not None:
                    pass   # windows cut on-device from the resident PCM
                elif self.device_mel:
                    start = st.seek * HOP_LENGTH
                    chunk = st.pcm_padded[start:start + S]
                    if (chunk.dtype == np.int16
                            and mel_windows.dtype != np.int16):
                        chunk = chunk.astype(np.float32) / 32768.0
                    mel_windows[row, :len(chunk)] = chunk
                else:
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

            self.phase_times["prep"] += _time.perf_counter() - _t_iter
            _t0 = _time.perf_counter()
            # drop the previous iteration's cross-KV BEFORE dispatching the
            # next encode: holding both alive is a ~2x cross-KV transient
            # (q8 large-v3 B=48 is ~6 GB/iteration) that fragments HBM and
            # makes iterations progressively slower
            kc = vc = None  # noqa: F841
            if pcm_dev is not None:
                kc, vc = self._encode_batch_sliced(pcm_dev, rows_idx, starts)
            else:
                if self.mesh is not None:
                    from jax.sharding import NamedSharding
                    from .mesh import batch_spec
                    mel_windows = jax.device_put(
                        jnp.asarray(mel_windows),
                        NamedSharding(self.mesh, batch_spec(self.mesh)))
                kc, vc = self._encode_batch(mel_windows)
            import os as _os
            if _os.environ.get("WTPU_PHASE_FENCE") == "1":
                # measurement only: encode dispatch is async, so without a
                # fence its cost lands in the decode phase
                jax.block_until_ready(kc)
            self.phase_times["encode"] += _time.perf_counter() - _t0

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
                live = np.zeros((self.B,), bool)
                live[pending] = True
                seeks = np.zeros((self.B,), np.int32)
                ends = np.zeros((self.B,), np.int32)
                for r in pending:
                    seeks[r] = states[batch[r]].seek
                    ends[r] = states[batch[r]].seek_end
                _t0 = _time.perf_counter()
                out = self._decode_rows(
                    [cur_prompts[r] if r < B and live[r] else
                     list(self.prompt_init) for r in range(self.B)],
                    kc, vc, live, seeks, ends, t_cur)
                self.phase_times["decode"] += _time.perf_counter() - _t0
                _t0 = _time.perf_counter()
                still_failed = []
                for r in pending:
                    st = states[batch[r]]
                    ok = self._row_success(out, r, t_cur,
                                           last=(it == len(temps) - 1))
                    if ok:
                        self._finish_window(st, out, r, int(out["n_tokens"]),
                                            cur_prompts[r])
                    else:
                        still_failed.append(r)
                pending = still_failed
                self.phase_times["finish"] += _time.perf_counter() - _t0
            self.window_times.append((B, _time.perf_counter() - _t_iter))

        return [st.result_all for st in states]

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

    def _decode_rows(self, prompts, kc, vc, live, seeks, ends, t_cur):
        """Decode `prompts[r]` against cross-KV row r for every live row.

        Rows stay in their natural batch positions — no cross-KV gather
        (an eager take on the q8 stack would transiently double ~8 GB at
        large-v3 B=48+ and OOM the chip); dead rows decode their own
        (masked, ignored) window.  Output row r corresponds to prompts[r].
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
            p.max_tokens, "greedy")
        # host-side uint32 key == jax.random.PRNGKey(seed) bit-for-bit for
        # seeds < 2**32; avoids a device op + fetch per iteration.  All
        # inputs ride _PackedWindowFn's single blob upload; results come
        # back as numpy in one fetch.
        key = np.array([0, int(t_cur * 100)], np.uint32)
        return fn(ctx.params, kc, vc, buf, pad_len, t_cur, seeks, ends,
                  key, live)

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
        for prompt in (bare, carried):
            out = self._decode_rows([prompt] * self.B, kc, vc, live,
                                    zeros, zeros, 0.0)
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
            # loop-failed row reaching the final temperature keeps its OWN
            # full sampled sequence (not the batch-global step count — the
            # EOT-initialized tail would pollute segment tokens), exactly
            # like the serial path
            from ..api import _own_sampled_len
            best = {
                "tokens": out["tokens"][row], "p": out["p"][row],
                "plog": out["plog"][row], "tid": out["tid"][row],
                "pt": out["pt"][row], "ptsum": out["ptsum"][row],
                "result_len": result_len,
                "n_emit": (_own_sampled_len(out["tokens"][row], n_sampled,
                                            ctx.vocab.token_eot)
                           if failed else result_len),
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




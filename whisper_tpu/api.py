"""Public API: context, parameters, and the transcription orchestrator.

Mirrors the reference C API surface (reference: include/whisper.h) and the
control flow of `whisper_full_with_state`
(reference: src/whisper.cpp:5481-6397): sliding 30 s window, temperature
fallback ladder, prompt-past conditioning, timestamp-token segmentation.

The device work per window — encoder, cross-KV and the ENTIRE token loop —
is one jitted call each (see decode/loop.py); the host only orchestrates
windows and assembles segments.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .audio.mel import log_mel_spectrogram
from .constants import CHUNK_SIZE, MAX_DECODERS, TICKS_PER_SECOND
from .decode.filters import FilterConsts, FilterOptions
from .decode.loop import LoopConfig, make_decode_window
from .languages import lang_id as _lang_id, lang_str
from .models import whisper as wm
from .tokenizer import tokenize
from .utils.logging import log_debug, log_error, log_info, log_warn
from .utils.timings import Timings
from .weights.convert import params_from_ggml
from .weights.ggml_reader import read_ggml_file

DELTA_MIN = 10  # 100 ms in ticks


class _PackedWindowFn:
    """Single-upload / single-fetch wrapper around a window-decode fn.

    On a tunneled TPU every host<->device transfer pays a round trip; the
    raw decode_window signature is ~9 small uploads and its result dict
    ~14 fetches per call — and the serving loop makes one such call per
    iteration.  This wrapper packs every non-resident input into ONE
    (B+1, P+4) int32 blob (prompt | pad_len | seek | seek_end | live,
    with temperature/rng bit-cast into a trailer row) and concatenates
    every output leaf into ONE f32 vector fetched with a single
    np.asarray.  Output int32 leaves are token ids/counters < 2**24, so
    the f32 round-trip is exact.

    The call signature matches make_decode_window's; seek/seek_end may be
    scalars (serial path) or (B,) arrays (batch path); rng may be a host
    uint32[2] array (no device traffic at all) or a device PRNG key.
    Results come back as a numpy pytree.
    """

    def __init__(self, fn, P: int, has_live: bool, in_shardings=None,
                 per_row_rng: bool = False):
        self.fn = fn
        self.P = P
        self.has_live = has_live
        # per_row_rng: the decode fn takes a (B, 2) per-row key array
        # (order-independent draws, see decode/loop.py sample()); the keys
        # ride two extra int columns of the same single blob upload
        self.per_row_rng = per_row_rng
        self._leaf_meta = None
        self._treedef = None

        def core(params, kc, vc, blob):
            nB = blob.shape[0] - 1
            ints = blob[:nB]
            prompt = ints[:, :P]
            pad_len = ints[:, P]
            seeks = ints[:, P + 1]
            ends = ints[:, P + 2]
            trailer = blob[nB]
            t_cur = jax.lax.bitcast_convert_type(trailer[0], jnp.float32)
            if per_row_rng:
                rng = jax.lax.bitcast_convert_type(
                    ints[:, P + 4:P + 6], jnp.uint32)
            else:
                rng = jax.lax.bitcast_convert_type(trailer[1:3], jnp.uint32)
            args = (params, kc, vc, prompt, pad_len, t_cur, seeks, ends, rng)
            if has_live:
                args += (ints[:, P + 3] != 0,)
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return jnp.concatenate(
                [jnp.ravel(x).astype(jnp.float32) for x in leaves])

        self._jit = (jax.jit(core) if in_shardings is None
                     else jax.jit(core, in_shardings=in_shardings))

    def __call__(self, params, kc, vc, prompt, pad_len, temperature,
                 seek, seek_end, rng, row_live=None):
        prompt = np.asarray(prompt, np.int32)
        B, P = prompt.shape
        assert P == self.P, (P, self.P)
        W = P + 6 if self.per_row_rng else P + 4
        blob = np.zeros((B + 1, W), np.int32)
        blob[:B, :P] = prompt
        blob[:B, P] = np.asarray(pad_len)
        blob[:B, P + 1] = np.asarray(seek)        # scalar broadcasts
        blob[:B, P + 2] = np.asarray(seek_end)
        blob[:B, P + 3] = (1 if row_live is None
                           else np.asarray(row_live).astype(np.int32))
        blob[B, 0] = np.float32(temperature).view(np.int32)
        if self.per_row_rng:
            blob[:B, P + 4:P + 6] = np.asarray(
                rng, np.uint32).view(np.int32).reshape(B, 2)
        else:
            blob[B, 1:3] = np.asarray(rng).view(np.int32).reshape(-1)[:2]
        if self._leaf_meta is None:
            out_shape = jax.eval_shape(
                self.fn, params, kc, vc,
                jax.ShapeDtypeStruct((B, P), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct(
                    (B, 2) if self.per_row_rng else (2,), jnp.uint32),
                *([jax.ShapeDtypeStruct((B,), jnp.bool_)]
                  if self.has_live else []))
            leaves, self._treedef = jax.tree_util.tree_flatten(out_shape)
            self._leaf_meta = [(l.shape, np.dtype(l.dtype)) for l in leaves]
        packed = np.asarray(self._jit(params, kc, vc, blob))
        arrs, off = [], 0
        for shape, dtype in self._leaf_meta:
            n = int(np.prod(shape)) if shape else 1
            a = packed[off:off + n].reshape(shape)
            arrs.append(a if dtype == np.float32 else a.astype(dtype))
            off += n
        return jax.tree_util.tree_unflatten(self._treedef, arrs)


class SamplingStrategy:
    GREEDY = 0
    BEAM_SEARCH = 1


@dataclasses.dataclass
class GreedyParams:
    best_of: int = 5  # reference default for GREEDY (whisper.cpp:4867)


@dataclasses.dataclass
class BeamSearchParams:
    beam_size: int = 5
    patience: float = -1.0


@dataclasses.dataclass
class FullParams:
    """whisper_full_params (reference: include/whisper.h:476-573,
    defaults src/whisper.cpp:4785-4885)."""
    strategy: int = SamplingStrategy.GREEDY

    n_threads: int = 4
    n_max_text_ctx: int = 16384
    offset_ms: int = 0
    duration_ms: int = 0

    translate: bool = False
    no_context: bool = True
    no_timestamps: bool = False
    single_segment: bool = False
    print_special: bool = False
    print_progress: bool = True
    print_realtime: bool = False
    print_timestamps: bool = True

    token_timestamps: bool = False
    thold_pt: float = 0.01
    thold_ptsum: float = 0.01
    max_len: int = 0
    split_on_word: bool = False
    max_tokens: int = 0

    debug_mode: bool = False
    audio_ctx: int = 0

    tdrz_enable: bool = False

    suppress_regex: Optional[str] = None

    initial_prompt: Optional[str] = None
    prompt_tokens: Optional[list[int]] = None

    language: Optional[str] = "en"
    detect_language: bool = False

    suppress_blank: bool = True
    suppress_nst: bool = False

    temperature: float = 0.0
    max_initial_ts: float = 1.0
    length_penalty: float = -1.0

    temperature_inc: float = 0.2
    entropy_thold: float = 2.4
    logprob_thold: float = -1.0
    no_speech_thold: float = 0.6

    greedy: GreedyParams = dataclasses.field(default_factory=GreedyParams)
    beam_search: BeamSearchParams = dataclasses.field(
        default_factory=BeamSearchParams)

    new_segment_callback: Optional[Callable] = None
    progress_callback: Optional[Callable] = None
    encoder_begin_callback: Optional[Callable] = None
    abort_callback: Optional[Callable] = None
    logits_filter_callback: Optional[Callable] = None

    grammar_rules: Optional[list] = None
    i_start_rule: int = 0
    grammar_penalty: float = 100.0


def full_default_params(strategy: int = SamplingStrategy.GREEDY) -> FullParams:
    p = FullParams(strategy=strategy)
    if strategy == SamplingStrategy.BEAM_SEARCH:
        p.beam_search = BeamSearchParams(beam_size=5)
    return p


@dataclasses.dataclass
class TokenData:
    """whisper_token_data (reference: include/whisper.h:88-108)."""
    id: int
    tid: int
    p: float
    plog: float
    pt: float
    ptsum: float
    t0: int = -1
    t1: int = -1
    t_dtw: int = -1
    vlen: float = 0.0


@dataclasses.dataclass
class Segment:
    """whisper_segment (reference: src/whisper.cpp:504-514)."""
    t0: int
    t1: int
    text: str
    no_speech_prob: float
    tokens: list[TokenData]
    speaker_turn_next: bool = False



class WhisperState:
    """Per-session decoding state (whisper_state; reference:
    src/whisper.cpp:830-975).  Multiple states can share one context's
    weights and compiled functions — the reference uses this for
    whisper_full_parallel's thread-per-chunk scheme and for servers
    handling concurrent requests."""

    def __init__(self):
        self.mel: np.ndarray | None = None        # (n_len, n_mel)
        self.mel_n_len_org = 0
        self.lang_id_state = 0
        self.no_speech_prob = 0.0
        self.result_all: list[Segment] = []
        self.prompt_past: list[int] = []
        self.energy: np.ndarray | None = None
        self.t_beg = 0
        self.t_last = 0
        self.tid_last = 0
        self.exp_n_audio_ctx = 0
        self.timings = Timings()
        # capi raw encode/decode session state (whisper_encode/
        # decode_with_state must keep cross-KV/logits/self-KV on ITS
        # state, not the context default)
        self._capi_logits = None
        self._capi_kv = None
        self._encoded = None

    # segment accessors on the state itself (the reference's *_from_state
    # functions read the state directly)
    def full_n_segments(self): return len(self.result_all)
    def full_lang_id(self): return self.lang_id_state
    def full_get_segment_t0(self, i): return self.result_all[i].t0
    def full_get_segment_t1(self, i): return self.result_all[i].t1
    def full_get_segment_text(self, i): return self.result_all[i].text
    def full_get_segment_speaker_turn_next(self, i):
        return self.result_all[i].speaker_turn_next
    def full_get_segment_no_speech_prob(self, i):
        return self.result_all[i].no_speech_prob
    def full_n_tokens(self, i): return len(self.result_all[i].tokens)
    def full_get_token_id(self, i, j): return self.result_all[i].tokens[j].id
    def full_get_token_data(self, i, j): return self.result_all[i].tokens[j]
    def full_get_token_p(self, i, j): return self.result_all[i].tokens[j].p


def _session_property(name):
    def get(self):
        return getattr(self._cur_state, name)

    def set_(self, value):
        setattr(self._cur_state, name, value)

    return property(get, set_)

class WhisperContext:
    """whisper_context + whisper_state, JAX edition.

    Use `WhisperContext.from_file(path)` then `ctx.full(params, samples)`.
    """

    def __init__(self, model_file, compute_dtype=jnp.bfloat16,
                 dtw_token_timestamps: bool = False,
                 dtw_aheads_preset: str = "none",
                 dtw_n_top: int = 0,
                 dtw_aheads=None,
                 keep_quantized: bool = True,
                 cross_mode: str = "einsum"):
        self.model_file = model_file
        # cross-attention KV path in the token loop: "einsum" (bf16, exact),
        # "einsum_q8" (int8 K/V, ~2x decode HBM headroom), or "einsum_q4"
        # (nibble-packed 4-bit K/V, 4x — opt-in accuracy trade; see
        # decode/loop.py and ops/cross_attention.py)
        self.cross_mode = cross_mode
        self.dtw_token_timestamps = dtw_token_timestamps
        self.dtw_aheads_preset = dtw_aheads_preset
        self.dtw_n_top = dtw_n_top
        self.dtw_aheads = dtw_aheads
        self.hparams = model_file.hparams
        self.vocab = model_file.vocab
        self.filters = model_file.filters
        self.n_loaded = model_file.n_loaded
        self.compute_dtype = compute_dtype
        # quantized decoder weights ride the Pallas dequant-matmul kernel on
        # TPU; on CPU (tests) the kernel is unavailable, so densify there
        keep_q = keep_quantized and jax.default_backend() not in ("cpu",)
        self.params, self.config = params_from_ggml(
            model_file, dtype=compute_dtype, keep_quantized=keep_q)
        self._default_state = WhisperState()
        self._cur_state = self._default_state
        self.mesh = None   # set by BatchTranscriber(mesh=...) for multichip
        self._jit_cache: dict = {}
        self._enc_cache: dict = {}
        self._cross: tuple | None = None

    # ---- constructors (whisper_init_*; reference: whisper.h:195-228) -----

    @classmethod
    def from_file(cls, path: str, compute_dtype=jnp.bfloat16,
                  **kwargs) -> "WhisperContext":
        mf = read_ggml_file(path)
        ctx = cls(mf, compute_dtype=compute_dtype, **kwargs)
        hp = mf.hparams
        log_info(f"loaded model '{path}': type {hp.model_type}, "
                 f"n_vocab {hp.n_vocab}, n_audio_ctx {hp.n_audio_ctx}, "
                 f"n_text_layer {hp.n_text_layer}, "
                 f"{'no tensors (stub)' if ctx.n_loaded == 0 else f'{ctx.n_loaded} tensors'}")
        return ctx

    @classmethod
    def from_buffer(cls, buf: bytes, compute_dtype=jnp.bfloat16,
                    **kwargs) -> "WhisperContext":
        return cls(read_ggml_file(buf), compute_dtype=compute_dtype, **kwargs)

    @classmethod
    def from_random(cls, size: str = "large-v3", seed: int = 0,
                    compute_dtype=jnp.bfloat16,
                    cross_mode: str = "einsum",
                    dims: tuple | None = None) -> "WhisperContext":
        """Random-weight context at exact named dims with a synthetic vocab.

        The timing-faithful bench/serving-test fixture: every tensor shape,
        special-token id and filter constant matches the real model, only
        the weight values (and token strings) are synthetic.  Used by
        bench.py's serving mode, which has no model files available.

        dims: optional MODEL_DIMS-shaped tuple overriding `size` — the
        multichip dryrun uses micro dims so the whole orchestrator runs in
        seconds on the virtual CPU mesh.
        """
        from .models.whisper import MODEL_DIMS, WhisperConfig
        from .weights.convert import random_params
        from .weights.ggml_reader import Hparams, synthetic_vocab

        if dims is None:
            dims = MODEL_DIMS[size]
        cfg = WhisperConfig(*dims, model_type=size)
        # special ids come from the one shared derivation
        # (weights/ggml_reader.special_token_ids)
        vocab = synthetic_vocab(cfg.n_vocab)

        from .audio.filters import mel_filterbank

        self = object.__new__(cls)
        self.model_file = None
        self.cross_mode = cross_mode
        self.dtw_token_timestamps = False
        self.dtw_aheads_preset = "none"
        self.dtw_n_top = 0
        self.dtw_aheads = None
        self.hparams = Hparams(*dims, ftype=1)
        self.vocab = vocab
        self.filters = mel_filterbank(cfg.n_mels).astype(np.float32)
        self.compute_dtype = compute_dtype
        self.params = random_params(cfg, seed=seed, dtype=compute_dtype)
        self.n_loaded = len(jax.tree_util.tree_leaves(self.params))
        self.config = cfg
        self._default_state = WhisperState()
        self._cur_state = self._default_state
        self.mesh = None
        self._jit_cache = {}
        self._enc_cache = {}
        self._cross = None
        return self

    # ---- introspection (reference: whisper.h:380-439) --------------------

    def n_vocab(self) -> int: return self.hparams.n_vocab
    def n_audio_ctx(self) -> int: return self.hparams.n_audio_ctx
    def n_text_ctx(self) -> int: return self.hparams.n_text_ctx
    def is_multilingual(self) -> bool: return self.vocab.is_multilingual
    def token_to_str(self, tid: int) -> str: return self.vocab.token_str(tid)
    def token_eot(self) -> int: return self.vocab.token_eot
    def token_sot(self) -> int: return self.vocab.token_sot
    def token_prev(self) -> int: return self.vocab.token_prev
    def token_nosp(self) -> int: return self.vocab.token_nosp
    def token_not(self) -> int: return self.vocab.token_not
    def token_beg(self) -> int: return self.vocab.token_beg
    def token_translate(self) -> int: return self.vocab.token_translate
    def token_transcribe(self) -> int: return self.vocab.token_transcribe
    def token_lang(self, lid: int) -> int: return self.vocab.token_lang(lid)
    def tokenize(self, text: str) -> list[int]: return tokenize(self.vocab, text)

    # ---- mel (whisper_pcm_to_mel / whisper_set_mel) ----------------------

    def pcm_to_mel(self, samples: np.ndarray) -> None:
        t0 = time.perf_counter()
        self.mel, self.mel_n_len_org = log_mel_spectrogram(samples, self.filters)
        self.timings.t_mel_us += int((time.perf_counter() - t0) * 1e6)

    def set_mel(self, mel: np.ndarray) -> None:
        """Custom mel injection (reference: whisper_set_mel, whisper.cpp:3894).
        mel: (n_len, n_mel); n_mel must match the model."""
        if mel.shape[1] != self.hparams.n_mels:
            raise ValueError(
                f"invalid number of mel bands: {mel.shape[1]} "
                f"(expected {self.hparams.n_mels})")
        self.mel = np.asarray(mel, dtype=np.float32)
        self.mel_n_len_org = mel.shape[0]

    def n_len_from_state(self) -> int:
        return self.mel_n_len_org

    # ---- jit plumbing ----------------------------------------------------

    def _encode_fn(self, n_ctx: int):
        key = ("enc", n_ctx)
        if key not in self._jit_cache:
            nh_a, nh_t = self.config.n_audio_head, self.config.n_text_head
            cd = self.compute_dtype

            @jax.jit
            def run(params, mel):
                enc = wm.encode(params, mel, n_head=nh_a, compute_dtype=cd)
                kc, vc = wm.cross_kv(params, enc, n_head=nh_t, compute_dtype=cd)
                return enc, kc, vc

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _regex_suppress_ids(self, pattern: str) -> tuple:
        """Token ids whose text fully matches `pattern`
        (reference: suppress_regex, src/whisper.cpp:5098-5106)."""
        key = ("regex", pattern)
        if key not in self._jit_cache:
            import re as _re
            pat = _re.compile(pattern)
            ids = tuple(sorted(
                tid for tok, tid in self.vocab.token_to_id.items()
                if pat.fullmatch(tok.decode("utf-8", errors="replace"))))
            self._jit_cache[key] = ids
        return self._jit_cache[key]

    def _decode_window_fn(self, B: int, P: int, opts: FilterOptions,
                          single_segment: bool, no_timestamps: bool,
                          max_tokens: int, strategy: str = "greedy",
                          extra_suppress: tuple = (),
                          per_row_rng: bool = False):
        key = ("dec", B, P, opts, single_segment, no_timestamps, max_tokens,
               strategy, extra_suppress, self.cross_mode, per_row_rng)
        if key not in self._jit_cache:
            consts = FilterConsts.from_vocab(self.vocab, self.hparams.n_audio_ctx)
            cfg = LoopConfig(
                n_head=self.config.n_text_head,
                n_text_ctx=self.hparams.n_text_ctx,
                prompt_size=P,
                # max_tokens caps the loop at i >= max_tokens, so trip count
                # and the (B, N)/(…, C) buffers can shrink to match — same
                # tokens, ~3x less KV memory at serving's max_tokens=64
                max_tokens_loop=(
                    min(self.hparams.n_text_ctx // 2 - 4, max_tokens + 1)
                    if max_tokens > 0 else self.hparams.n_text_ctx // 2 - 4),
                max_tokens_param=max_tokens,
                single_segment=single_segment,
                no_timestamps=no_timestamps,
                compute_dtype=self.compute_dtype,
                cross_mode=self.cross_mode,
            )
            # the mesh layout only applies when this call's batch can
            # shard over the data axes — a serial ctx.full() on a
            # context that a mesh BatchTranscriber also uses (B=1, or
            # B=n_decoders) must compile a plain single-device fn, not
            # inherit batch in_shardings it can't satisfy
            use_mesh = self.mesh is not None
            if use_mesh:
                n_data = (self.mesh.shape.get("data", 1)
                          * self.mesh.shape.get("slice", 1))
                use_mesh = n_data > 0 and B % n_data == 0
            if strategy == "beam":
                from .decode.beam import make_beam_decode_window
                fn = make_beam_decode_window(
                    consts=consts, options=opts, cfg=cfg, beam_size=B,
                    extra_suppress=extra_suppress,
                    mesh=self.mesh if use_mesh else None)
            else:
                fn = make_decode_window(
                    consts=consts, options=opts, cfg=cfg,
                    extra_suppress=extra_suppress,
                    mesh=self.mesh if use_mesh else None)
            in_sh = None
            if use_mesh:
                # explicit multichip layout: windows over "data", heads
                # over "model" (see parallel/mesh.py); the packed blob is
                # replicated
                from .parallel.mesh import decode_window_blob_shardings
                in_sh = decode_window_blob_shardings(
                    self.mesh, self.params,
                    quant_cross=self.cross_mode in (
                        "einsum_q8", "pallas_q8dt", "einsum_q8i",
                        "einsum_q4"))
            self._jit_cache[key] = _PackedWindowFn(
                fn, P, has_live=(strategy != "beam"), in_shardings=in_sh,
                per_row_rng=per_row_rng)
        return self._jit_cache[key]

    def _beam_batch_window_fn(self, S: int, K: int, P: int,
                              opts: FilterOptions, single_segment: bool,
                              no_timestamps: bool, max_tokens: int,
                              extra_suppress: tuple = ()):
        """Batched beam search: S streams x K beams in one device batch
        (decode/beam.make_batched_beam_decode_window).  Inputs are
        per-stream rows (B = S for the packed blob; rng is (S, 2)
        per-stream keys), outputs per-beam rows (S*K)."""
        key = ("decbb", S, K, P, opts, single_segment, no_timestamps,
               max_tokens, extra_suppress, self.cross_mode)
        if key not in self._jit_cache:
            from .decode.beam import make_batched_beam_decode_window
            consts = FilterConsts.from_vocab(self.vocab,
                                             self.hparams.n_audio_ctx)
            cfg = LoopConfig(
                n_head=self.config.n_text_head,
                n_text_ctx=self.hparams.n_text_ctx,
                prompt_size=P,
                max_tokens_loop=(
                    min(self.hparams.n_text_ctx // 2 - 4, max_tokens + 1)
                    if max_tokens > 0 else self.hparams.n_text_ctx // 2 - 4),
                max_tokens_param=max_tokens,
                single_segment=single_segment,
                no_timestamps=no_timestamps,
                compute_dtype=self.compute_dtype,
                cross_mode=self.cross_mode,
            )
            fn = make_batched_beam_decode_window(
                consts=consts, options=opts, cfg=cfg, n_streams=S,
                beam_size=K, extra_suppress=extra_suppress)
            self._jit_cache[key] = _PackedWindowFn(
                fn, P, has_live=True, per_row_rng=True)
        return self._jit_cache[key]

    def _mel_window(self, seek: int) -> np.ndarray:
        """(1, 2*n_ctx, n_mels) mel slice at `seek` (zero-padded)."""
        n_ctx = self.exp_n_audio_ctx or self.hparams.n_audio_ctx
        want = 2 * n_ctx
        mel = self.mel
        out = np.zeros((want, mel.shape[1]), dtype=np.float32)
        avail = max(0, min(want, mel.shape[0] - seek))
        out[:avail] = mel[seek:seek + avail]
        return out[None]

    def encode_window(self, seek: int):
        """Encoder + cross-KV for the 30 s window at `seek` (ticks)."""
        t0 = time.perf_counter()
        mel_win = jnp.asarray(self._mel_window(seek))
        enc, kc, vc = self._encode_fn(mel_win.shape[1] // 2)(self.params, mel_win)
        jax.block_until_ready(enc)
        self.timings.t_encode_us += int((time.perf_counter() - t0) * 1e6)
        self.timings.n_encode += 1
        return enc, kc, vc

    # ---- language detection (reference: src/whisper.cpp:4027-4108) -------

    def lang_auto_detect(self, offset_ms: int = 0) -> tuple[int, np.ndarray]:
        seek = offset_ms // 10
        if seek >= self.mel_n_len_org:
            raise ValueError("offset is past the end of the audio")
        _, kc, vc = self.encode_window(seek)

        prompt = jnp.asarray([[self.vocab.token_sot]], dtype=jnp.int32)
        nh = self.config.n_text_head
        logits, _, _ = wm.decode_prompt(
            self.params, prompt, jnp.zeros((1, 1), jnp.int32), kc, vc,
            n_head=nh, compute_dtype=self.compute_dtype)
        logits = np.asarray(logits[0, -1])

        lang_ids = [self.vocab.token_lang(i) for i in range(100)]
        lang_logits = logits[lang_ids]
        probs = np.exp(lang_logits - lang_logits.max())
        probs /= probs.sum()
        best = int(np.argmax(probs))
        return best, probs

    def init_state(self) -> "WhisperState":
        """whisper_init_state: a fresh session sharing this model."""
        return WhisperState()

    def use_state(self, state: "WhisperState"):
        """Context manager routing session fields to `state`
        (the *_with_state C-API family)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            prev = self._cur_state
            self._cur_state = state or prev
            try:
                yield self
            finally:
                self._cur_state = prev
        return _cm()

    # ---- the orchestrator (whisper_full) ---------------------------------

    def full(self, params: FullParams, samples: Optional[np.ndarray],
             state: Optional["WhisperState"] = None) -> int:
        if state is not None:
            prev = self._cur_state
            self._cur_state = state
            try:
                return self._full_impl(params, samples)
            finally:
                self._cur_state = prev
        return self._full_impl(params, samples)

    def _full_impl(self, params: FullParams,
                   samples: Optional[np.ndarray]) -> int:
        self.result_all = []
        language = params.language

        if samples is not None and len(samples) > 0:
            self.pcm_to_mel(samples)

        if (language is None or language == "" or language == "auto"
                or params.detect_language):
            lid, probs = self.lang_auto_detect()
            self.lang_id_state = lid
            language = lang_str(lid)
            # write the detection back so everything downstream that reads
            # params.language (DTW teacher-forced prompt, callbacks) sees
            # the resolved language (reference: src/whisper.cpp:5510)
            params.language = language
            log_info(f"auto-detected language: {language} (p = {probs[lid]:.6f})")
            if params.detect_language:
                return 0

        if params.token_timestamps:
            self.t_beg = self.t_last = self.tid_last = 0
            if samples is not None and len(samples) > 0:
                from .timestamps import get_signal_energy
                self.energy = get_signal_energy(samples, 32)

        seek_start = params.offset_ms // 10
        seek_end = (self.n_len_from_state() if params.duration_ms == 0
                    else seek_start + params.duration_ms // 10)

        if seek_end < seek_start + DELTA_MIN:
            log_warn(f"input is too short - {(seek_end - seek_start) * 10} ms "
                     "< 100 ms. consider padding the input audio with silence")
            return 0

        # temperature ladder (reference: src/whisper.cpp:5541-5549)
        if params.temperature_inc > 0.0:
            temperatures = []
            t = params.temperature
            while t < 1.0 + 1e-6:
                temperatures.append(t)
                t += params.temperature_inc
        else:
            temperatures = [params.temperature]

        if params.strategy == SamplingStrategy.GREEDY:
            n_decoders = params.greedy.best_of
        else:
            n_decoders = max(params.greedy.best_of, params.beam_search.beam_size)
        n_decoders = max(1, n_decoders)
        if n_decoders > MAX_DECODERS:
            log_error(f"too many decoders requested ({n_decoders}), "
                      f"max = {MAX_DECODERS}")
            return -4

        if params.no_context:
            self.prompt_past = []

        # initial prompt handling (reference: src/whisper.cpp:5592-5617)
        prompt_tokens = params.prompt_tokens
        if prompt_tokens is None and params.initial_prompt:
            prompt_tokens = tokenize(self.vocab, params.initial_prompt)
        if prompt_tokens:
            self.prompt_past = list(prompt_tokens) + self.prompt_past

        if params.audio_ctx > self.hparams.n_audio_ctx:
            log_error("audio_ctx is larger than the maximum allowed")
            return -5
        self.exp_n_audio_ctx = params.audio_ctx

        # task prompt (reference: src/whisper.cpp:5627-5651)
        prompt_init = [self.vocab.token_sot]
        if self.vocab.is_multilingual:
            lid = _lang_id(language or "en")
            self.lang_id_state = lid
            prompt_init.append(self.vocab.token_lang(lid))
            prompt_init.append(self.vocab.token_translate if params.translate
                               else self.vocab.token_transcribe)

        is_distil = (self.hparams.n_text_layer == 2
                     and self.hparams.n_vocab != 51866)
        no_timestamps = params.no_timestamps
        if is_distil and not no_timestamps:
            log_warn("using first release distilled models - forcing no_timestamps")
            no_timestamps = True
        if no_timestamps:
            prompt_init.append(self.vocab.token_not)

        opts = FilterOptions(
            suppress_blank=params.suppress_blank,
            no_timestamps=no_timestamps,
            tdrz_enable=params.tdrz_enable,
            suppress_nst=params.suppress_nst,
            max_initial_ts=params.max_initial_ts,
        )

        seek = seek_start

        # main sliding-window loop
        while True:
            if params.progress_callback:
                progress = (100 * (seek - seek_start)) // max(1, seek_end - seek_start)
                params.progress_callback(self, progress)

            if seek + DELTA_MIN >= seek_end:
                break

            if params.encoder_begin_callback:
                if not params.encoder_begin_callback(self):
                    log_error("encoder_begin_callback returned false - aborting")
                    break

            if params.abort_callback and params.abort_callback(self):
                log_warn("abort_callback requested stop")
                break

            _, kc, vc = self.encode_window(seek)

            # drop confusing old prompt near the very end
            # (reference: src/whisper.cpp:5697-5700)
            if seek > seek_start and seek + 500 >= seek_end:
                self.prompt_past = []

            if self.n_loaded == 0:
                # stub model (test path, reference: whisper.cpp:6050-6055):
                # no weights — skip decoding, consume the whole window
                seek += TICKS_PER_SECOND * CHUNK_SIZE
                continue

            best = None
            for it, t_cur in enumerate(temperatures):
                if params.strategy == SamplingStrategy.GREEDY:
                    n_cur = params.greedy.best_of if t_cur > 0.0 else 1
                else:
                    n_cur = (params.greedy.best_of if t_cur > 0.0
                             else params.beam_search.beam_size)
                n_cur = max(1, n_cur)

                # prompt assembly (reference: src/whisper.cpp:5759-5771)
                prompt: list[int] = []
                if self.prompt_past and t_cur < 0.5 and params.n_max_text_ctx > 0:
                    n_take = min(params.n_max_text_ctx,
                                 self.hparams.n_text_ctx // 2,
                                 len(self.prompt_past))
                    prompt = [self.vocab.token_prev] + self.prompt_past[-n_take:]
                prompt = prompt + prompt_init

                needs_host_loop = (params.grammar_rules is not None
                                   or params.logits_filter_callback is not None)
                if needs_host_loop:
                    host_beam = (params.strategy == SamplingStrategy.BEAM_SEARCH
                                 and params.beam_search.beam_size > 1)
                    if host_beam:
                        # grammar under beam search (reference applies
                        # grammar per decoder inside its beam loop,
                        # whisper.cpp:5925-5977).  At t > 0 the slot count
                        # drops to best_of and candidates are drawn
                        # multinomially, like the reference (:5718-5724)
                        from .decode.host_beam import decode_window_host_beam
                        n_cur = (params.beam_search.beam_size if t_cur <= 0.0
                                 else max(1, params.greedy.best_of))
                        result = decode_window_host_beam(
                            self, prompt, kc, vc, t_cur, seek, seek_end,
                            params, opts, no_timestamps,
                            grammar=params.grammar_rules, beam_size=n_cur,
                            seed=it)
                    else:
                        # greedy + grammar/logits-filter: batched host
                        # loop with best_of decoders at t > 0 (reference:
                        # whisper.cpp:5718-5724) and speculative device
                        # chunking at t == 0 (decode/grammar_loop.py)
                        from .decode.grammar_loop import \
                            decode_window_grammar
                        n_cur = (1 if t_cur < 1e-6
                                 else max(1, params.greedy.best_of))
                        result = decode_window_grammar(
                            self, prompt, kc, vc, t_cur, seek, seek_end,
                            params, opts, no_timestamps,
                            grammar=params.grammar_rules,
                            n_decoders=n_cur, seed=it)
                else:
                    # beam search runs at every ladder temperature like the
                    # reference (whisper.cpp:5881-5890 keeps beam-candidate
                    # sampling at t > 0, with best_of slots per :5718-5724;
                    # candidates switch from top-k to multinomial draws
                    # inside beam.py, whisper.cpp:5357-5430)
                    use_beam = params.strategy == SamplingStrategy.BEAM_SEARCH
                    result = self._decode_window(
                        prompt, kc, vc, n_cur, t_cur, seek, seek_end,
                        params, opts, no_timestamps, attempt=it,
                        strategy="beam" if use_beam else "greedy")

                self.no_speech_prob = float(result["no_speech_prob"][0])

                # rank sequences + ladder decision — shared with the batch
                # serving path (reference: src/whisper.cpp:6169-6230)
                best, n_fail_h = _rank_window_candidates(
                    result, n_cur, params, last=(it == len(temperatures) - 1),
                    token_eot=self.vocab.token_eot)
                self.timings.n_fail_h += n_fail_h
                if best is not None:
                    best["prompt"] = prompt
                    break
                self.timings.n_fail_p += 1

            if best is None:
                # every temperature failed; consume the window
                seek += TICKS_PER_SECOND * CHUNK_SIZE
                continue

            n_seg_before = len(self.result_all)
            seek_new = self._emit_segments(best, seek, seek_end, params,
                                           prompt_init, no_timestamps)

            # DTW pass over the new segments (reference: whisper.cpp:6364-6378)
            n_new = len(self.result_all) - n_seg_before
            if self.dtw_token_timestamps and n_new:
                from .dtw import compute_token_level_timestamps_dtw
                n_frames = min(CHUNK_SIZE * TICKS_PER_SECOND,
                               best["seek_delta"], seek_end - seek)
                compute_token_level_timestamps_dtw(
                    self, params, n_seg_before, n_new, seek, n_frames,
                    medfilt_width=7)
                if params.new_segment_callback:
                    # deferred until after DTW stamped the tokens; one call
                    # covering every new segment (the reference's per-seg
                    # loop at whisper.cpp:6372-6376 double-reports)
                    params.new_segment_callback(
                        self, len(self.result_all) - n_seg_before)

            seek = seek_new

        return 0

    # ------------------------------------------------------------------

    def _decode_window(self, prompt, kc, vc, n_cur, t_cur, seek, seek_end,
                       params, opts, no_timestamps, attempt=0,
                       strategy="greedy"):
        """One jitted device call decoding the whole window."""
        # prompt buffer size: tiny when unconditioned, full when carrying past
        P = 8 if len(prompt) <= 8 else (
            self.hparams.n_text_ctx // 2 + 8)
        extra = (self._regex_suppress_ids(params.suppress_regex)
                 if params.suppress_regex else ())
        per_row = strategy != "beam"
        fn = self._decode_window_fn(
            n_cur, P, opts, params.single_segment, no_timestamps,
            params.max_tokens, strategy, extra, per_row_rng=per_row)

        pad = P - len(prompt)
        buf = np.zeros((n_cur, P), dtype=np.int32)
        buf[:, pad:] = np.asarray(prompt, dtype=np.int32)
        pad_len = np.full((n_cur,), pad, dtype=np.int32)

        # cross-KV computed for batch 1; broadcast across decoders
        if n_cur > 1 and kc.shape[1] == 1:
            kc = jnp.broadcast_to(kc, (kc.shape[0], n_cur) + kc.shape[2:])
            vc = jnp.broadcast_to(vc, (vc.shape[0], n_cur) + vc.shape[2:])

        t0 = time.perf_counter()
        # all-live row mask; inputs stay host-side — _PackedWindowFn ships
        # them in one blob upload and fetches all results in one transfer.
        # Draw keys derive from (window seek, ladder attempt, candidate),
        # so the same window re-decoded through the BATCHED serving path
        # gets bit-identical multinomial draws (see loop.py sample())
        rng = window_rng(seek, attempt, n_cur, per_row=per_row)
        extra_args = (() if strategy == "beam"
                      else (np.ones((n_cur,), bool),))
        out = fn(self.params, kc, vc, buf, pad_len,
                 t_cur, seek, seek_end, rng, *extra_args)
        dt = int((time.perf_counter() - t0) * 1e6)
        n_tok = int(out["n_tokens"])
        self.timings.t_decode_us += dt
        self.timings.n_decode += max(n_tok, 1)
        self.timings.n_sample += max(n_tok, 1)
        self.timings.n_prompt += len(prompt)

        import os
        if os.environ.get("WTPU_DEBUG") == "1":
            # per-token trace (the reference's WHISPER_DEBUG,
            # whisper.cpp:6017-6023)
            for j in range(out["tokens"].shape[0]):
                toks = out["tokens"][j][:n_tok]
                log_debug(
                    f"decoder {j}: t={t_cur:.2f} "
                    f"completed={bool(out['completed'][j])} "
                    f"failed={bool(out['failed'][j])} "
                    f"result_len={int(out['result_len'][j])} | " +
                    " ".join(
                        f"{int(t)}:{self.vocab.token_str(int(t))!r}"
                        f"(p={out['p'][j][i]:.3f})"
                        for i, t in enumerate(toks[:24])))
        return out

    def _prompt_step_fns(self):
        """Jitted prompt/step functions for the host-loop compat path."""
        if "compat" not in self._jit_cache:
            nh = self.config.n_text_head
            cd = self.compute_dtype

            @jax.jit
            def prompt_fn(params, tokens, kc, vc):
                T = tokens.shape[1]
                mask = wm.make_causal_mask(T)
                logits, ks, vs = wm.decode_prompt(
                    params, tokens, jnp.arange(T), kc, vc, n_head=nh,
                    self_mask=mask, compute_dtype=cd)
                # full (B, T, V): the capi whisper_decode contract needs a
                # logits row per prompt token; loop callers slice [:, -1]
                return logits, ks, vs

            @jax.jit
            def step_fn(params, tok, pos, cache_idx, kv, kc, vc, kv_len):
                return wm.decode_step(params, tok, pos, cache_idx, kv, kc, vc,
                                      kv_len=kv_len, n_head=nh,
                                      compute_dtype=cd)

            self._jit_cache["compat"] = (prompt_fn, step_fn)
        return self._jit_cache["compat"]

    def _emit_segments(self, best, seek, seek_end, params, prompt_init,
                       no_timestamps) -> int:
        """Segment assembly (reference: src/whisper.cpp:6232-6390).
        Returns the new seek."""
        vocab = self.vocab
        result_len = best["result_len"]
        seek_delta = best["seek_delta"]
        prompt = best["prompt"]

        # the sequence is truncated to result_len before emission
        # (reference: whisper.cpp:6180 tokens.resize(result_len)) — tokens
        # sampled after the final accepted timestamp must NOT be emitted
        # (they belong to the next window, which re-decodes them)
        n_emit = best.get("n_emit", result_len)
        tokens_cur = [
            TokenData(id=int(best["tokens"][i]), tid=int(best["tid"][i]),
                      p=float(best["p"][i]), plog=float(best["plog"][i]),
                      pt=float(best["pt"][i]), ptsum=float(best["ptsum"][i]))
            for i in range(n_emit)
        ]

        is_no_speech = (self.no_speech_prob > params.no_speech_thold
                        and best["avg_logprobs"] < params.logprob_thold)

        # update prompt_past (reference: src/whisper.cpp:6248-6257)
        self.prompt_past = []
        if prompt and prompt[0] == vocab.token_prev:
            self.prompt_past = prompt[1:len(prompt) - len(prompt_init)]
        if not is_no_speech:
            self.prompt_past += [t.id for t in tokens_cur[:result_len]]

        if tokens_cur and self.n_loaded > 0 and not is_no_speech:
            i0 = 0
            t0 = seek + 2 * (tokens_cur[0].tid - vocab.token_beg)
            text = ""
            speaker_turn_next = False

            i = 0
            while i < len(tokens_cur):
                tok = tokens_cur[i]
                if params.print_special or tok.id < vocab.token_eot:
                    text += vocab.token_str(tok.id)

                if params.tdrz_enable and tok.id == vocab.token_solm:
                    speaker_turn_next = True

                if tok.id > vocab.token_beg and not params.single_segment:
                    t1 = seek + 2 * (tok.tid - vocab.token_beg)
                    if text:
                        self._push_segment(t0, t1, text, tokens_cur[i0:i + 1],
                                           speaker_turn_next, params)
                    text = ""
                    while (i < len(tokens_cur)
                           and tokens_cur[i].id > vocab.token_beg):
                        i += 1
                    i -= 1
                    t0 = t1
                    i0 = i + 1
                    speaker_turn_next = False
                i += 1

            if text:
                t1 = seek + seek_delta
                self._push_segment(t0, t1, text, tokens_cur[i0:],
                                   speaker_turn_next, params)

        # single-timestamp ending: skip the whole chunk
        # (reference: src/whisper.cpp:6380-6387)
        if (len(tokens_cur) > 1
                and tokens_cur[-2].id < vocab.token_beg
                and tokens_cur[-1].id > vocab.token_beg):
            seek_delta = min(seek_end - seek, CHUNK_SIZE * TICKS_PER_SECOND)

        return seek + seek_delta

    def _push_segment(self, t0, t1, text, tokens, speaker_turn_next, params):
        if params.print_realtime:
            from .outputs import to_timestamp
            if params.print_timestamps:
                print(f"[{to_timestamp(int(t0))} --> {to_timestamp(int(t1))}]"
                      f"  {text}", flush=True)
            else:
                print(text, end="", flush=True)
        seg = Segment(t0=int(t0), t1=int(t1), text=text,
                      no_speech_prob=self.no_speech_prob,
                      tokens=list(tokens),
                      speaker_turn_next=speaker_turn_next)
        self.result_all.append(seg)
        n_new = 1
        if params.token_timestamps:
            from .timestamps import compute_token_level_timestamps
            compute_token_level_timestamps(
                self, len(self.result_all) - 1,
                params.thold_pt, params.thold_ptsum)
            if params.max_len > 0:
                from .timestamps import wrap_segment
                n_new = wrap_segment(self, params.max_len, params.split_on_word)
        if params.new_segment_callback and not self.dtw_token_timestamps:
            params.new_segment_callback(self, n_new)

    def full_parallel(self, params: FullParams, samples: np.ndarray,
                      n_processors: int = 1) -> int:
        """whisper_full_parallel (reference: src/whisper.cpp:6407-6520).

        The reference splits audio across CPU threads with per-thread
        states.  Here the accelerator is the shared resource, so chunks run
        back-to-back through the same jitted pipeline (the batched
        multi-stream path in parallel/batch.py is the high-throughput way
        to transcribe many streams).  Segment merging, timestamp offsets,
        and overlap clamping match the reference.
        """
        if n_processors <= 1:
            return self.full(params, samples)

        # the TPU-native fast path: chunks ride ONE batched device pipeline
        # (B-axis = chunks) instead of running back-to-back — the real
        # speedup n_processors promises.  language="auto" rides it too
        # (per-chunk batched detection).  Falls back to the serial loop
        # for features the batched loop doesn't cover (grammar, callbacks,
        # beam, detect_language's detect-then-stop mode).
        can_batch = (params.grammar_rules is None
                     and params.logits_filter_callback is None
                     and params.encoder_begin_callback is None
                     and params.abort_callback is None
                     and params.strategy == SamplingStrategy.GREEDY
                     and not params.detect_language
                     # token-level timestamps need the signal-energy /
                     # DTW passes that only the serial full() runs
                     and not params.token_timestamps
                     and not self.dtw_token_timestamps
                     and self.n_loaded > 0)
        if can_batch:
            return self._full_parallel_batched(params, samples, n_processors)

        offset_samples = (16000 * params.offset_ms) // 1000
        n_per = (len(samples) - offset_samples) // n_processors
        offset_t = params.offset_ms // 10

        # chunk 0 runs on the default state (includes the leading offset)
        ret = self.full(params, samples[:offset_samples + n_per])
        merged = list(self.result_all)

        chunk_params = dataclasses.replace(
            params, offset_ms=0, print_progress=False, print_realtime=False,
            new_segment_callback=None, progress_callback=None)

        # remaining chunks on fresh states (reference spawns a thread per
        # chunk; the accelerator is serial here so they run back-to-back)
        for i in range(n_processors - 1):
            start = offset_samples + (i + 1) * n_per
            end = len(samples) if i == n_processors - 2 else start + n_per
            state = self.init_state()
            rc = self.full(chunk_params, samples[start:end], state=state)
            if rc != 0:
                ret = rc
            shift = 100 * ((i + 1) * n_per) // 16000 + offset_t
            for seg in state.result_all:
                seg.t0 += shift
                seg.t1 += shift
                if merged:
                    seg.t0 = max(seg.t0, merged[-1].t1)
                merged.append(seg)
                if params.new_segment_callback:
                    self.result_all = merged  # accessor view during callback
                    params.new_segment_callback(self, 1)

        self.result_all = merged
        log_warn(f"the audio has been split into {n_processors} chunks at "
                 "the following times:")
        from .outputs import to_timestamp
        for i in range(n_processors - 1):
            t = 100 * ((i + 1) * n_per) // 16000 + offset_t
            log_warn(f"split {i + 1} - {to_timestamp(t)}")
        log_warn("the transcription quality may be degraded near these boundaries")
        return ret

    def _full_parallel_batched(self, params: FullParams, samples,
                               n_processors: int) -> int:
        """full_parallel via the batched pipeline: every chunk is a row of
        one BatchTranscriber batch (parallel/batch.py).  Segment merging,
        timestamp shifts and overlap clamping match the serial path."""
        from .parallel.batch import BatchTranscriber

        offset_samples = (16000 * params.offset_ms) // 1000
        n_per = (len(samples) - offset_samples) // n_processors
        offset_t = params.offset_ms // 10

        chunks = []
        for i in range(n_processors):
            start = offset_samples + i * n_per
            end = (len(samples) if i == n_processors - 1
                   else start + n_per)
            chunks.append(np.asarray(samples[start:end], np.float32))

        chunk_params = dataclasses.replace(
            params, offset_ms=0, print_progress=False, print_realtime=False,
            new_segment_callback=None, progress_callback=None)
        bt = BatchTranscriber(self, batch_size=n_processors,
                              params=chunk_params)
        results = bt.transcribe(chunks)
        if bt.auto_lang and bt.last_states:
            # each chunk detected its own language (as each reference
            # thread does); the context-level lang id is chunk 0's, the
            # state the reference merges results into (whisper.cpp:6450)
            lid = bt.last_states[0].full_lang_id()
            self.lang_id_state = lid
            params.language = lang_str(lid)

        merged: list[Segment] = []
        for i, segs in enumerate(results):
            shift = 100 * (i * n_per) // 16000 + offset_t
            for seg in segs:
                seg.t0 += shift
                seg.t1 += shift
                if merged:
                    seg.t0 = max(seg.t0, merged[-1].t1)
                merged.append(seg)
                if params.new_segment_callback:
                    self.result_all = merged
                    params.new_segment_callback(self, 1)
        self.result_all = merged

        log_warn(f"the audio has been split into {n_processors} chunks at "
                 "the following times:")
        from .outputs import to_timestamp
        for i in range(n_processors - 1):
            t = 100 * ((i + 1) * n_per) // 16000 + offset_t
            log_warn(f"split {i + 1} - {to_timestamp(t)}")
        log_warn("the transcription quality may be degraded near these "
                 "boundaries")
        return 0

    # ---- segment accessors (reference: src/whisper.cpp:6522-6617) --------

    def full_n_segments(self) -> int: return len(self.result_all)
    def full_lang_id(self) -> int: return self.lang_id_state
    def full_get_segment_t0(self, i: int) -> int: return self.result_all[i].t0
    def full_get_segment_t1(self, i: int) -> int: return self.result_all[i].t1
    def full_get_segment_text(self, i: int) -> str: return self.result_all[i].text
    def full_get_segment_speaker_turn_next(self, i: int) -> bool:
        return self.result_all[i].speaker_turn_next
    def full_n_tokens(self, i: int) -> int: return len(self.result_all[i].tokens)
    def full_get_token_id(self, i: int, j: int) -> int:
        return self.result_all[i].tokens[j].id
    def full_get_token_text(self, i: int, j: int) -> str:
        return self.vocab.token_str(self.result_all[i].tokens[j].id)
    def full_get_token_data(self, i: int, j: int) -> TokenData:
        return self.result_all[i].tokens[j]
    def full_get_token_p(self, i: int, j: int) -> float:
        return self.result_all[i].tokens[j].p
    def full_get_segment_no_speech_prob(self, i: int) -> float:
        return self.result_all[i].no_speech_prob




# session-state attribute proxies: WhisperContext.<field> reads/writes the
# state selected by the current full()/init_state() call, preserving the
# reference's ctx-with-default-state ergonomics
for _f in ("mel", "mel_n_len_org", "lang_id_state", "no_speech_prob",
           "result_all", "prompt_past", "energy", "t_beg", "t_last",
           "tid_last", "exp_n_audio_ctx", "timings",
           "_capi_logits", "_capi_kv", "_encoded"):
    setattr(WhisperContext, _f, _session_property(_f))
del _f

def window_rng(seek, attempt: int, n_cur: int, per_row: bool = True):
    """Sampling keys for one window decode, derived from
    (window seek, ladder attempt, candidate index).

    Host-side uint32 pairs == jax.random.PRNGKey data bit-for-bit (threefry
    keys; any distinct pair is an independent stream), so no device op is
    needed.  Deriving from position rather than chaining a global key makes
    a window's multinomial draws independent of batch composition and
    decode order: serial full() and the batched serving path produce
    IDENTICAL retry candidates for the same audio.  per_row=False returns
    one (2,) key (beam search consumes a single stream per window)."""
    if not per_row:
        return np.array([np.uint32(seek), np.uint32(attempt)], np.uint32)
    keys = np.empty((n_cur, 2), np.uint32)
    keys[:, 0] = np.uint32(seek)
    keys[:, 1] = (np.uint32(attempt) << np.uint32(8)) + np.arange(
        n_cur, dtype=np.uint32)
    return keys


def _own_sampled_len(tokens, n_tokens: int, token_eot: int) -> int:
    """Length of one row's own sampled sequence inside the batch-global
    step budget `n_tokens`: the loop's token buffer is EOT-initialized, so
    trailing token_eot entries belong to OTHER rows' longer decodes, not
    this row (a row that actually sampled EOT was marked completed, never
    failed)."""
    toks = np.asarray(tokens[:n_tokens])
    nz = np.nonzero(toks != token_eot)[0]
    return int(nz[-1]) + 1 if nz.size else 0


def _sequence_score(plogs: np.ndarray, token_ids: np.ndarray,
                    length_penalty: float) -> tuple[float, float, float]:
    """whisper_sequence_score (reference: src/whisper.cpp:5433-5479).
    Returns (score, avg_logprobs, entropy-of-last-32-token-ids)."""
    n = len(plogs)
    if n == 0:
        return -math.inf, -math.inf, 0.0
    total = float(plogs.sum())
    avg = total / n
    if length_penalty > 0.0:
        penalty = ((5.0 + n) / 6.0) ** length_penalty
    else:
        penalty = float(n)
    score = total / penalty

    last = token_ids[max(0, n - 32):n]
    _, counts = np.unique(last, return_counts=True)
    ps = counts / counts.sum()
    entropy = float(-(ps * np.log(ps)).sum())
    return score, avg, entropy


def _rank_window_candidates(result, n_cur: int, params, last: bool,
                            token_eot: int, row0: int = 0):
    """Rank one window's n_cur candidate sequences and decide whether this
    temperature rung succeeded (reference: src/whisper.cpp:6169-6230).

    This is THE ladder decision — shared verbatim by the serial
    orchestrator (_full_impl) and the batched serving path
    (parallel/batch.py), so a window transcribed through either takes
    identical fallback decisions.

    result: decode output dict; rows [row0, row0 + n_cur) are this
    window's candidates.  last: final temperature rung (always emits).
    Returns (best: dict | None, n_fail_h: int).  best is None when the
    rung failed and a hotter retry should run; otherwise it carries the
    winning candidate's arrays + emission metadata (everything
    _emit_segments needs except "prompt", which the caller attaches).
    """
    best_j, best_score = -1, -math.inf
    seqs = []
    n_fail_h = 0
    for jj in range(n_cur):
        j = row0 + jj
        failed = bool(result["failed"][j])
        rl = int(result["result_len"][j])
        plogs = np.asarray(result["plog"][j][:rl])
        score, avg_lp, entropy = _sequence_score(
            plogs, np.asarray(result["tokens"][j][:rl]),
            params.length_penalty)
        if not failed and rl > 32 and entropy < params.entropy_thold:
            failed = True
            n_fail_h += 1
        seqs.append((failed, rl, score, avg_lp))
        if not failed and score > best_score:
            best_score, best_j = score, jj

    no_speech_prob = float(result["no_speech_prob"][row0])
    if not last:
        if best_j < 0:
            return None, n_fail_h
        avg_lp = seqs[best_j][3]
        if (avg_lp < params.logprob_thold
                and no_speech_prob < params.no_speech_thold):
            return None, n_fail_h

    jj = max(best_j, 0)
    j = row0 + jj
    # the reference resizes the winning sequence to result_len before
    # emission (whisper.cpp:6180); only a loop-failed candidate (possible
    # at the final rung when everything failed) keeps its full sampled
    # tail — ITS OWN tail, not the batch-global step count: the token
    # buffer is EOT-initialized, so trailing EOT padding (from rows that
    # decoded longer) must not be emitted
    n_emit = (_own_sampled_len(np.asarray(result["tokens"][j]),
                               int(result["n_tokens"]), token_eot)
              if bool(result["failed"][j]) else seqs[jj][1])
    best = {
        "tokens": np.asarray(result["tokens"][j]),
        "p": np.asarray(result["p"][j]),
        "plog": np.asarray(result["plog"][j]),
        "tid": np.asarray(result["tid"][j]),
        "pt": np.asarray(result["pt"][j]),
        "ptsum": np.asarray(result["ptsum"][j]),
        "result_len": seqs[jj][1],
        "n_emit": n_emit,
        "seek_delta": int(result["seek_delta"][j]),
        "avg_logprobs": seqs[jj][3],
        "no_speech_prob": no_speech_prob,
    }
    return best, n_fail_h

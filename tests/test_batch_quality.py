"""Quality decode configs on the batched serving path.

Round-3 verdict: the production BatchTranscriber carried only the
narrowest config (1 greedy decoder per row), silently dropping the
reference's best_of ladder diversity (whisper.cpp:5718-5724).  These
tests pin the round-4 fix: every temperature-fallback rung of the batch
path must take the SAME decisions and draws as the serial full() —
bit-identical segments, not just "both produce text".

Draw keys derive from (window seek, ladder attempt, candidate index)
(api.window_rng), so a window's multinomial candidates are independent
of batch composition — that is what makes exact parity possible.
"""

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.parallel.batch import BatchTranscriber
from conftest import make_random_model


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    path = make_random_model(tmp_path_factory.mktemp("m"))
    return wt.WhisperContext.from_file(path)


def _noise(seconds, seed=0):
    return (np.random.RandomState(int(seed))
            .randn(int(16000 * seconds)).astype(np.float32) * 0.1)


def _segs(segments):
    return [(s.t0, s.t1, s.text, tuple(t.id for t in s.tokens))
            for s in segments]


def _serial(ctx, params, streams):
    out = []
    for pcm in streams:
        state = ctx.init_state()
        assert ctx.full(params, pcm, state=state) == 0
        out.append(_segs(state.result_all))
    return out


def test_ladder_retry_best_of_matches_serial(ctx):
    """Force every rung to fail its quality gate (logprob_thold above any
    achievable avg logprob) so each window climbs the whole temperature
    ladder: t=0 greedy, then best_of=3 multinomial candidates per rung
    (tiled through the fixed-B loop, chunked since 3 candidates x 4
    pending > B=4).  Segments must equal the serial path's exactly."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 3
        p.logprob_thold = 5.0     # unreachable: every rung fails the gate
        p.no_speech_thold = 2.0   # keep the nsp escape hatch closed
        return p

    streams = [_noise(d, seed=100 + d) for d in (2, 3, 4, 2.5)]
    serial = _serial(ctx, mkparams(), streams)

    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def test_positive_start_temperature_matches_serial(ctx):
    """params.temperature > 0 from the start: the reference decodes
    best_of multinomial candidates on the FIRST rung (whisper.cpp:5718),
    so the batch path must tile candidates immediately (no natural-layout
    pass at all)."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 2
        p.temperature = 0.4
        p.temperature_inc = 0.0   # single rung
        return p

    streams = [_noise(d, seed=7 + d) for d in (2, 3)]
    serial = _serial(ctx, mkparams(), streams)
    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def test_best_of_one_multinomial_matches_serial(ctx):
    """best_of=1 at t>0: single multinomial candidate per window rides the
    natural-layout path; its draw key is position-independent, so it still
    matches serial bit-for-bit."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 1
        p.temperature = 0.3
        p.temperature_inc = 0.0
        return p

    streams = [_noise(d, seed=40 + d) for d in (2, 3, 4)]
    serial = _serial(ctx, mkparams(), streams)
    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def test_retry_parity_independent_of_batch_size(ctx):
    """The same streams through B=2 and B=4 transcribers (different
    chunking, different slot positions) produce identical segments —
    draws depend only on (seek, attempt, candidate)."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 2
        p.logprob_thold = 5.0
        p.no_speech_thold = 2.0
        return p

    streams = [_noise(d, seed=60 + d) for d in (2, 3, 2.5)]
    b2 = [_segs(s) for s in BatchTranscriber(
        ctx, batch_size=2, params=mkparams()).transcribe(streams)]
    b4 = [_segs(s) for s in BatchTranscriber(
        ctx, batch_size=4, params=mkparams()).transcribe(streams)]
    assert b2 == b4


def test_beam_search_batch_matches_serial(ctx):
    """Beam-5 on the serving path: S streams x K beams ride one device
    batch (grouped cross-attention, per-stream top-k) and must reproduce
    the serial beam search segment-for-segment at t=0 (deterministic
    beam: no draws involved)."""
    def mkparams():
        p = wt.full_default_params(wt.SamplingStrategy.BEAM_SEARCH)
        p.print_progress = False
        p.beam_search.beam_size = 3
        p.temperature_inc = 0.0   # single deterministic rung
        return p

    streams = [_noise(d, seed=80 + d) for d in (2, 3, 4)]
    serial = _serial(ctx, mkparams(), streams)
    bt = BatchTranscriber(ctx, batch_size=6, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def test_beam_ladder_retry_matches_serial(ctx):
    """Beam search with a forced fallback ladder: t=0 beams, then
    best_of multinomial slots at t>0 (reference: whisper.cpp:5718-5724).
    The per-stream draw keys make even the t>0 beam candidate draws
    bit-identical between the batched and serial paths."""
    def mkparams():
        p = wt.full_default_params(wt.SamplingStrategy.BEAM_SEARCH)
        p.print_progress = False
        p.beam_search.beam_size = 2
        p.greedy.best_of = 2
        p.logprob_thold = 5.0
        p.no_speech_thold = 2.0
        return p

    streams = [_noise(d, seed=90 + d) for d in (2, 3)]
    serial = _serial(ctx, mkparams(), streams)
    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def test_multiwindow_carried_prompts_match_serial(ctx):
    """Multi-window streams (seek advances 30 s per window) with
    prompt-past carried between windows: the batch path's carried-prompt
    assembly and bucket sizing must reproduce serial exactly, including
    when retries interleave with the carry."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 2
        p.logprob_thold = 5.0     # force retries on top of the carry
        p.no_speech_thold = 2.0
        p.temperature_inc = 0.5
        return p

    streams = [_noise(s, seed=200 + s) for s in (35, 62)]   # 2 and 3 windows
    serial = _serial(ctx, mkparams(), streams)
    assert any(len(s) > 1 for s in serial), "expected multi-window output"
    bt = BatchTranscriber(ctx, batch_size=2, params=mkparams())
    batch = [_segs(segs) for segs in bt.transcribe(streams)]
    assert serial == batch


def _segs_with_token_times(segments):
    return [(s.t0, s.t1, s.text,
             tuple((t.id, t.t0, t.t1, t.t_dtw) for t in s.tokens))
            for s in segments]


def test_energy_token_timestamps_match_serial(ctx):
    """params.token_timestamps (+max_len wrapping) on the batch path: the
    per-stream signal-energy pass stamps identical t0/t1 on every token."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.token_timestamps = True
        p.max_len = 10
        p.temperature_inc = 0.0
        return p

    streams = [_noise(d, seed=120 + d) for d in (2, 3)]
    serial = []
    for pcm in streams:
        state = ctx.init_state()
        assert ctx.full(mkparams(), pcm, state=state) == 0
        serial.append(_segs_with_token_times(state.result_all))
    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs_with_token_times(s) for s in bt.transcribe(streams)]
    assert serial == batch


def test_dtw_token_timestamps_match_serial(tmp_path):
    """DTW timestamps on the batch path: this iteration's finished windows
    share ONE batched teacher-forced cross-QK re-decode, and every token's
    t_dtw equals the serial per-window pass exactly."""
    path = make_random_model(tmp_path)
    dtw_kw = dict(dtw_token_timestamps=True, dtw_aheads_preset="n_top_most",
                  dtw_n_top=2)
    ctx = wt.WhisperContext.from_file(path, **dtw_kw)

    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.temperature_inc = 0.0
        return p

    streams = [_noise(d, seed=130 + d) for d in (2, 3, 4)]
    serial = []
    for pcm in streams:
        state = ctx.init_state()
        assert ctx.full(mkparams(), pcm, state=state) == 0
        serial.append(_segs_with_token_times(state.result_all))

    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs_with_token_times(s) for s in bt.transcribe(streams)]
    assert serial == batch
    # DTW actually stamped something (not vacuous parity)
    stamped = [tok[3] for segs in batch for s in segs for tok in s[3]]
    assert any(t >= 0 for t in stamped)


def test_window_rng_derivation():
    """Keys are (seek, attempt<<8 | candidate) uint32 pairs; the beam form
    is a single (2,) key."""
    from whisper_tpu.api import window_rng
    k = window_rng(1234, 2, 3)
    assert k.shape == (3, 2) and k.dtype == np.uint32
    assert list(k[:, 0]) == [1234] * 3
    assert list(k[:, 1]) == [512, 513, 514]
    kb = window_rng(99, 1, 4, per_row=False)
    assert kb.shape == (2,) and list(kb) == [99, 1]


def test_best_of_exceeding_batch_matches_serial(ctx):
    """best_of > batch_size: a stream's ladder candidates span several
    passes of the fixed-B loop (_ladder_retry_multipass) and are ranked
    across the merged results — previously n_cand was silently capped at
    the batch size, so any batch smaller than the reference's default
    best_of=5 diverged from serial on every retried window."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.greedy.best_of = 5
        p.logprob_thold = 5.0     # force the ladder on every window
        p.no_speech_thold = 2.0
        return p

    streams = [_noise(d, seed=300 + d) for d in (3, 2)]
    serial = _serial(ctx, mkparams(), streams)
    for B in (2, 3):              # B < best_of: multipass merging engages
        bt = BatchTranscriber(ctx, batch_size=B, params=mkparams())
        batch = [_segs(segs) for segs in bt.transcribe(streams)]
        assert batch == serial, f"batch_size={B}"


def test_beam_wider_than_batch_is_refused(ctx):
    """Beam rows are coupled within a decode step, so beam_size (and the
    ladder's best_of when temperature_inc > 0) cannot exceed the batch;
    the engine must refuse loudly, never silently decode fewer beams."""
    p = wt.full_default_params(wt.SamplingStrategy.BEAM_SEARCH)
    p.print_progress = False
    p.beam_search.beam_size = 5
    with pytest.raises(ValueError, match="beam"):
        BatchTranscriber(ctx, batch_size=2, params=p)

    # ladder off: a wide best_of is irrelevant, beam_size <= B is enough
    p2 = wt.full_default_params(wt.SamplingStrategy.BEAM_SEARCH)
    p2.print_progress = False
    p2.beam_search.beam_size = 2
    p2.greedy.best_of = 8
    p2.temperature_inc = 0.0
    BatchTranscriber(ctx, batch_size=2, params=p2)

    # ladder on: best_of bounds the t>0 rung slots and must fit too
    p2.temperature_inc = 0.2
    with pytest.raises(ValueError, match="best_of"):
        BatchTranscriber(ctx, batch_size=2, params=p2)


def test_auto_language_matches_serial(ctx):
    """language="auto" rides the batch (round-5 verdict ask #3): a batched
    [sot] pre-pass detects each stream's language (reference:
    whisper_full_with_state:5504 -> whisper_lang_auto_detect:4027-4108)
    and the rest of the window decode must match the serial path's
    segments exactly — including the detected lang id."""
    def mkparams():
        p = wt.full_default_params()
        p.print_progress = False
        p.language = "auto"
        return p

    streams = [_noise(d, seed=500 + d) for d in (2, 3, 2.5)]
    serial, serial_lids = [], []
    for pcm in streams:
        state = ctx.init_state()
        prm = mkparams()
        assert ctx.full(prm, pcm, state=state) == 0
        serial.append(_segs(state.result_all))
        serial_lids.append(state.full_lang_id())

    bt = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    states = [bt._make_stream(pcm) for pcm in streams]
    assert all(st.prompt_init is None for st in states)   # unresolved
    bt._detect_languages(states, list(range(len(states))))
    assert [st.full_lang_id() for st in states] == serial_lids
    # and the real end-to-end path produces serial-identical segments
    bt2 = BatchTranscriber(ctx, batch_size=4, params=mkparams())
    batch = [_segs(segs) for segs in bt2.transcribe(streams)]
    assert batch == serial


def test_auto_language_quantized_cross_kv(ctx, tmp_path):
    """language="auto" on a QUANTIZED cross-KV context (the serving
    default): _encode_slots hands back an untagged (codes, scales) pair
    and the detect pre-pass must tag it at trace time — regression for
    the round-5 q8 crash ('tuple' has no attribute 'shape').  Detected
    lang ids must match the bf16 context's."""
    path = make_random_model(tmp_path)
    qctx = wt.WhisperContext.from_file(path, cross_mode="einsum_q8")

    p = wt.full_default_params()
    p.print_progress = False
    p.language = "auto"
    streams = [_noise(d, seed=500 + d) for d in (2, 3)]

    bt = BatchTranscriber(qctx, batch_size=2, params=p)
    states = [bt._make_stream(pcm) for pcm in streams]
    bt._detect_languages(states, list(range(len(states))))
    q_lids = [st.full_lang_id() for st in states]

    bt_bf = BatchTranscriber(ctx, batch_size=2, params=p)
    states_bf = [bt_bf._make_stream(pcm) for pcm in streams]
    bt_bf._detect_languages(states_bf, list(range(len(states_bf))))
    assert q_lids == [st.full_lang_id() for st in states_bf]

    # and end-to-end transcription on the q8 ctx completes
    results = BatchTranscriber(qctx, batch_size=2, params=p) \
        .transcribe(streams)
    assert len(results) == 2


def test_dtw_timestamps_quantized_cross_kv(tmp_path):
    """Batched DTW re-decode on a QUANTIZED cross-KV context: _dtw_qk_fn
    must tag the untagged (codes, scales) pair inside the jit (a string
    in the argument pytree is not a valid JAX type) — regression for the
    round-5 q8 crash."""
    path = make_random_model(tmp_path)
    qctx = wt.WhisperContext.from_file(
        path, cross_mode="einsum_q8", dtw_token_timestamps=True,
        dtw_aheads_preset="n_top_most", dtw_n_top=2)
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    streams = [_noise(d, seed=130 + d) for d in (2, 3)]
    batch = [_segs_with_token_times(s) for s in
             BatchTranscriber(qctx, batch_size=2, params=p)
             .transcribe(streams)]
    stamped = [tok[3] for segs in batch for s in segs for tok in s[3]]
    assert any(t >= 0 for t in stamped)


def test_detect_language_only(ctx):
    """params.detect_language: the batch path detects and stops, emitting
    no segments (reference: whisper.cpp:5515 early return)."""
    p = wt.full_default_params()
    p.print_progress = False
    p.language = "auto"
    p.detect_language = True
    bt = BatchTranscriber(ctx, batch_size=2, params=p)
    results = bt.transcribe([_noise(2, seed=1), _noise(3, seed=2)])
    assert results == [[], []]

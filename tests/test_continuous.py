"""Continuous batching: slot refill between window iterations, no
head-of-line blocking (round-4 verdict ask #2).

The reference server processes one request at a time against one
whisper_context (reference: examples/server/server.cpp:694); the plain
BatchTranscriber admits work only at batch boundaries.  ContinuousBatcher
re-picks the device batch before EVERY window iteration, so these tests
assert scheduling structurally (iteration indices, completion order) —
no wall-clock flakiness.
"""

import time

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.parallel.batch import ContinuousBatcher
from conftest import make_random_model


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    path = make_random_model(tmp_path_factory.mktemp("m"))
    return wt.WhisperContext.from_file(path)


def _noise(seconds, seed=0):
    return (np.random.RandomState(int(seed))
            .randn(int(16000 * seconds)).astype(np.float32) * 0.1)


def _params():
    p = wt.full_default_params()
    p.print_progress = False
    p.single_segment = True   # full-window seek advance: window count is
    p.max_tokens = 5          # deterministic = ceil(duration / window)
    return p


def _segs(segments):
    return [(s.t0, s.t1, s.text) for s in segments]


def _wait(pred, timeout=120.0, interval=0.02):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_continuous_matches_serial(ctx):
    streams = [_noise(d, seed=10 + d) for d in (2, 3, 4)]
    serial = []
    for pcm in streams:
        state = ctx.init_state()
        assert ctx.full(_params(), pcm, state=state) == 0
        serial.append(_segs(state.result_all))

    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    try:
        jobs = [eng.submit_async(pcm) for pcm in streams]
        for j in jobs:
            assert j.done.wait(timeout=300)
            assert j.error is None
        assert [_segs(j.st.result_all) for j in jobs] == serial
        # bookkeeping populated
        for j in jobs:
            assert j.iter_joined is not None and j.iter_done is not None
            assert j.t_done is not None and j.t_first_segment is not None
    finally:
        eng.close()


def test_midflight_join_first_segment_within_one_iteration(ctx):
    """A request arriving while a long stream is mid-decode joins the very
    next window iteration and gets its first segment there — it does NOT
    wait for the long stream to drain.  The engine's iteration_hook pins
    the join point deterministically (no wall-clock racing)."""
    import threading

    # single_segment advances seek by the full 30 s chunk per window, so
    # 235 s of audio is 8 window iterations and 35 s is 2
    long_pcm = _noise(235, seed=1)
    short_pcm = _noise(35, seed=2)

    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    release = threading.Event()
    paused = threading.Event()

    def hook(n):
        if n >= 2 and not release.is_set():
            paused.set()
            release.wait(timeout=120)

    eng.iteration_hook = hook
    try:
        a = eng.submit_async(long_pcm)
        # the engine parks between iterations 2 and 3, A mid-flight
        assert paused.wait(timeout=300)
        assert not a.done.is_set()
        b = eng.submit_async(short_pcm)
        release.set()
        assert b.done.wait(timeout=300) and b.error is None
        # joined mid-flight (at the paused iteration or right after it)...
        assert b.iter_joined >= 2
        # ...and finished within (its own window count + 1 admission
        # iteration), far before the long stream
        n_windows_b = -(-35 * 100 // 3000)        # ceil(ticks / window)
        assert b.iter_done - b.iter_joined <= n_windows_b + 1
        assert a.done.wait(timeout=300) and a.error is None
        assert b.iter_done < a.iter_done
        assert b.t_first_segment is not None
    finally:
        eng.iteration_hook = None
        release.set()
        eng.close()


def test_slot_refill_from_queue(ctx):
    """Three streams, two slots: when the short stream in slot 1 finishes,
    the queued third stream takes its slot while the long stream is still
    decoding — completion order is (B, C, A)."""
    a = _noise(235, seed=3)   # 8 windows (30 s seek advance per window)
    b = _noise(35, seed=4)    # 2 windows
    c = _noise(35, seed=5)

    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    try:
        ja = eng.submit_async(a)
        jb = eng.submit_async(b)
        jc = eng.submit_async(c)
        for j in (ja, jb, jc):
            assert j.done.wait(timeout=300) and j.error is None
        assert jb.iter_done < ja.iter_done
        assert jc.iter_done < ja.iter_done     # refilled B's slot mid-batch
        assert jc.iter_done >= jb.iter_done
    finally:
        eng.close()


def test_beam_strategy_rides_continuous_engine(ctx):
    """Beam-search params flow through the continuous engine's iterations
    (batched beam kernel) and match the serial beam exactly."""
    p = wt.full_default_params(wt.SamplingStrategy.BEAM_SEARCH)
    p.print_progress = False
    p.beam_search.beam_size = 2
    p.temperature_inc = 0.0

    streams = [_noise(d, seed=20 + d) for d in (2, 3)]
    serial = []
    for pcm in streams:
        state = ctx.init_state()
        assert ctx.full(p, pcm, state=state) == 0
        serial.append(_segs(state.result_all))

    eng = ContinuousBatcher(ctx, batch_size=4, params=p)
    try:
        jobs = [eng.submit_async(pcm) for pcm in streams]
        for j in jobs:
            assert j.done.wait(timeout=300) and j.error is None
        assert [_segs(j.st.result_all) for j in jobs] == serial
    finally:
        eng.close()


def test_too_short_stream_resolves_immediately(ctx):
    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    try:
        j = eng.submit_async(np.zeros(400, np.float32))
        assert j.done.wait(timeout=60)
        assert j.error is None and j.st.result_all == []
    finally:
        eng.close()


def test_close_rejects_new_and_drains(ctx):
    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(_noise(2))


def test_on_segment_streams_progressively(ctx):
    """submit_async(on_segment=...) delivers each finalized segment as the
    engine produces it: every segment arrives BEFORE the job resolves,
    in order, and the full set equals result_all (the server's SSE
    /stream endpoint rides this hook)."""
    pcm = _noise(65, seed=42)  # 3 windows at single_segment=True

    state = ctx.init_state()
    assert ctx.full(_params(), pcm, state=state) == 0
    serial = _segs(state.result_all)
    assert len(serial) >= 2, "need a multi-segment stream for this test"

    eng = ContinuousBatcher(ctx, batch_size=2, params=_params())
    try:
        got = []
        order_ok = []

        def on_segment(seg):
            got.append((seg.t0, seg.t1, seg.text))
            order_ok.append(len(got))

        job = eng.submit_async(pcm, on_segment=on_segment)
        assert job.done.wait(timeout=300) and job.error is None
        assert got == serial == _segs(job.st.result_all)
        assert order_ok == sorted(order_ok)
        # a raising callback must not kill the engine or the job
        job2 = eng.submit_async(pcm, on_segment=lambda s: 1 / 0)
        assert job2.done.wait(timeout=300) and job2.error is None
        assert _segs(job2.st.result_all) == serial
    finally:
        eng.close()


def test_first_window_priority_over_inflight(ctx):
    """A second wave of streams gets its FIRST window before earlier
    streams decode their remaining windows: with one slot, stream B
    (submitted after the 4-window stream A) produces its first segment at
    the very next iteration after joining instead of waiting for A's full
    drain — the first-window-first policy that bounds TTFS by queue
    position rather than by the drain of everything ahead."""
    a = _noise(95, seed=21)    # 4 windows
    b = _noise(35, seed=22)    # 2 windows

    eng = ContinuousBatcher(ctx, batch_size=1, params=_params())
    try:
        ja = eng.submit_async(a)
        jb = eng.submit_async(b)
        for j in (ja, jb):
            assert j.done.wait(timeout=300) and j.error is None
        # B joined by iteration 1 and held the single slot at iteration 2
        # (its first window) even though A was still mid-flight
        assert jb.iter_first is not None
        assert jb.iter_first <= jb.iter_joined + 2
        # B finishes long before A despite FIFO submission order
        assert jb.iter_done < ja.iter_done
        # total work is unchanged: 4 + 2 windows = 6 iterations
        assert eng.n_iterations == 6
    finally:
        eng.close()


def test_resident_pcm_pool_matches_upload_path(ctx):
    """device_mel engines pin each admitted stream's PCM to a pool row
    (windows cut on-device; one upload per stream instead of one per
    window iteration).  Segments must equal the plain batch path's, rows
    must recycle, and the pool must actually carry the iterations."""
    from whisper_tpu.parallel.batch import BatchTranscriber

    streams = [(_noise(d, seed=30 + d) * 32768).clip(-32768, 32767)
               .astype(np.int16) for d in (35, 65, 35, 95)]

    eng = ContinuousBatcher(ctx, batch_size=2, params=_params(),
                            device_mel=True, max_active=4)
    pool_iters = []
    orig = eng.bt._iterate

    def spy(states, batch, pcm_dev=None):
        pool_iters.append(pcm_dev is not None)
        return orig(states, batch, pcm_dev)

    eng.bt._iterate = spy
    try:
        jobs = [eng.submit_async(pcm) for pcm in streams]
        for j in jobs:
            assert j.done.wait(timeout=300) and j.error is None
        cont = [_segs(j.st.result_all) for j in jobs]
        # every iteration rode the resident pool...
        assert pool_iters and all(pool_iters)
        # ...and every row was recycled on completion
        assert len(eng._pool_free) == eng.max_active
    finally:
        eng.close()

    bt = BatchTranscriber(ctx, batch_size=2, params=_params(),
                          device_mel=True)
    assert [_segs(s) for s in bt.transcribe(streams)] == cont

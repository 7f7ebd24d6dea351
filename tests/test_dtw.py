"""DTW token-timestamp component tests."""

import numpy as np
import pytest

from whisper_tpu.dtw import (AHEADS_PRESETS, aheads_for, dtw_backtrace,
                             head_select_matrix, median_filter)


def test_dtw_backtrace_diagonal():
    """A cost matrix with a clear diagonal valley -> diagonal path."""
    N = 5
    cost = np.full((N, N), 10.0)
    np.fill_diagonal(cost, 0.0)
    ti, tj = dtw_backtrace(cost)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == N - 1 and tj[-1] == N - 1
    # path is monotonic
    assert all(np.diff(ti) >= 0) and all(np.diff(tj) >= 0)
    # the diagonal is on the path
    on_path = set(zip(ti.tolist(), tj.tolist()))
    assert all((i, i) in on_path for i in range(N))


def test_dtw_backtrace_skewed():
    """2 tokens x 6 frames: both rows visited, frames cover the range."""
    cost = np.array([[0.0, 0.0, 0.0, 5, 5, 5],
                     [5, 5, 5, 0.0, 0.0, 0.0]])
    ti, tj = dtw_backtrace(cost)
    assert set(ti.tolist()) == {0, 1}
    assert tj[-1] == 5
    # transition to token 1 happens at frame >= 3
    first_t1 = tj[list(ti).index(1)]
    assert first_t1 >= 2


def test_median_filter_reflect():
    x = np.array([[1.0, 2.0, 3.0, 4.0, 100.0]])
    y = median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 0] == 2.0   # reflect: [2,1,2] -> 2
    assert y[0, 4] == 4.0   # spike suppressed: [4,100,4] -> 4


def test_aheads_presets_layer_bounds():
    from whisper_tpu.dtw import AHEADS_PRESETS
    layers = {"tiny": 4, "base": 6, "small": 12, "medium": 24,
              "large-v3": 32, "large-v3-turbo": 4}
    heads = {"tiny": 6, "base": 8, "small": 12, "medium": 16,
             "large-v3": 20, "large-v3-turbo": 20}
    for name, n_layer in layers.items():
        for l, h in AHEADS_PRESETS[name]:
            assert 0 <= l < n_layer, (name, l)
            assert 0 <= h < heads[name], (name, h)


def test_aheads_n_top_most():
    heads = aheads_for("n_top_most", n_text_layer=6, n_head=4, n_top=2)
    assert heads == [(4, h) for h in range(4)] + [(5, h) for h in range(4)]


def test_head_select_matrix():
    sel = head_select_matrix([(1, 0), (1, 3), (2, 2)], n_layer=3, n_head=4)
    assert sel.shape == (3, 2, 4)
    assert sel[1, 0, 0] == 1.0 and sel[1, 1, 3] == 1.0
    assert sel[2, 0, 2] == 1.0
    assert sel[0].sum() == 0.0         # layer 0 unused
    assert sel[2, 1].sum() == 0.0      # unused slot is zero


def test_dtw_e2e_fills_t_dtw(tmp_path):
    import whisper_tpu as wt
    from conftest import make_random_model

    path = make_random_model(tmp_path, seed=41, dec_layers=4)
    ctx = wt.WhisperContext.from_file(
        path, dtw_token_timestamps=True, dtw_aheads_preset="n_top_most",
        dtw_n_top=2)
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    pcm = (np.random.RandomState(41).randn(16000 * 2).astype(np.float32) * 0.1)
    assert ctx.full(p, pcm) == 0
    stamped = [t.t_dtw for s in ctx.result_all for t in s.tokens
               if t.id < ctx.vocab.token_eot]
    if stamped:
        assert any(t >= 0 for t in stamped)
        assert all(t == -1 or t >= 0 for t in stamped)

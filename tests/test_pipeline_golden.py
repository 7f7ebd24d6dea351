"""Full-pipeline golden: ctx.full() vs the actual reference binary.

The goldens `tests/golden/ref_{jfk,noise40}_greedy.json` are `-ojf` outputs
of the reference `whisper-cli` (built CPU-only from /root/reference at the
pinned snapshot: `cmake -DGGML_NATIVE=OFF -DGGML_OPENMP=OFF`, Release) run
on the shared seed-7 random-weight model:

    whisper-cli -m random-7.bin -f <audio> -nf -bs 1 -bo 1 -ojf

with random-7.bin = make_random_model(seed=7, ftype=1) (f16 weights — the
reference's CPU im2col requires f16 conv kernels) and
noise40.wav = RandomState(3).randn(16000*40)*0.1 clipped, int16 WAV.

This pins ORCHESTRATOR-level behavior (reference: src/whisper.cpp:5481-6397)
token-exactly: window seek advancement, prompt-past carry across windows,
segment splitting on timestamp pairs, the single-timestamp-ending chunk
skip, emission truncation to result_len, and the energy token-timestamp
pass (E31) — everything above the per-activation goldens.

Segment times, texts, token ids, and token-level t0/t1 must match EXACTLY;
token probabilities match to 1% (f32 ggml GEMM vs XLA numerics).

Beam-5 is deliberately NOT pinned against the binary: the reference draws
beam candidates multinomially via std::discrete_distribution even at t==0
(src/whisper.cpp:5357-5430), which is libstdc++-implementation-defined —
no cross-implementation golden exists even in principle.  Beam behavior is
covered by property tests in test_full.py instead.
"""

import json
import os

import numpy as np
import pytest

import whisper_tpu as wt
from conftest import make_random_model

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden_ctx(tmp_path_factory):
    path = make_random_model(tmp_path_factory.mktemp("m"), seed=7, ftype=1)
    return wt.WhisperContext.from_file(path)


def _params():
    # whisper-cli -nf -bs 1 -bo 1 -ojf equivalents
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0          # -nf
    p.greedy.best_of = 1             # -bo 1
    p.token_timestamps = True        # -ojf enables token timestamps
    return p


def _assert_matches_golden(ctx, golden_name):
    ref = json.load(open(os.path.join(GOLDEN, f"{golden_name}.json")))
    rt = ref["transcription"]
    assert ctx.full_n_segments() == len(rt), \
        f"segment count: ours {ctx.full_n_segments()} vs ref {len(rt)}"
    for i, rseg in enumerate(rt):
        seg = ctx.result_all[i]
        assert seg.t0 * 10 == rseg["offsets"]["from"], f"seg {i} t0"
        assert seg.t1 * 10 == rseg["offsets"]["to"], f"seg {i} t1"
        assert seg.text == rseg["text"], f"seg {i} text"
        rtoks = rseg["tokens"]
        assert len(seg.tokens) == len(rtoks), f"seg {i} token count"
        for j, (tok, rtok) in enumerate(zip(seg.tokens, rtoks)):
            assert tok.id == rtok["id"], f"seg {i} tok {j} id"
            assert tok.t0 * 10 == rtok["offsets"]["from"], f"seg {i} tok {j} t0"
            assert tok.t1 * 10 == rtok["offsets"]["to"], f"seg {i} tok {j} t1"
            assert tok.t_dtw == rtok["t_dtw"], f"seg {i} tok {j} t_dtw"
            assert tok.p == pytest.approx(rtok["p"], rel=0.01), \
                f"seg {i} tok {j} p"


def test_pipeline_golden_jfk(golden_ctx, jfk_pcm):
    """Single-window e2e: greedy t=0 on jfk.wav, token-exact vs whisper-cli."""
    assert golden_ctx.full(_params(), jfk_pcm) == 0
    _assert_matches_golden(golden_ctx, "ref_jfk_greedy")


def test_pipeline_golden_initial_prompt(golden_ctx, jfk_pcm):
    """--prompt: initial_prompt is tokenized (real tiny.en vocab, unicode +
    contraction + digits) and conditions the first window through
    prompt_past (reference: src/whisper.cpp:5592-5617).  Token-exact vs
    whisper-cli — pins the tokenizer inside the pipeline."""
    p = _params()
    p.initial_prompt = \
        "The naïve café doesn't exist on 42nd street in Zürich."
    assert golden_ctx.full(p, jfk_pcm) == 0
    _assert_matches_golden(golden_ctx, "ref_jfk_prompt")


def test_pipeline_golden_multiwindow(golden_ctx):
    """40 s multi-window e2e: seek advancement + prompt-past carry across
    windows, token-exact vs whisper-cli on the same synthetic audio."""
    rng = np.random.RandomState(3)
    pcm_f = (rng.randn(16000 * 40) * 0.1).clip(-1, 1)
    # round-trip through int16 exactly like the WAV the reference read
    pcm = ((pcm_f * 32767).astype(np.int16)).astype(np.float32) / 32768.0
    assert golden_ctx.full(_params(), pcm) == 0
    _assert_matches_golden(golden_ctx, "ref_noise40_greedy")


def test_pipeline_golden_silence(golden_ctx):
    """10 s of digital silence: pins the all-zero-mel / no-speech behavior
    (the reference still emits whatever greedy decodes; what matters is
    WE advance seek and segment identically)."""
    assert golden_ctx.full(_params(), np.zeros(16000 * 10, np.float32)) == 0
    _assert_matches_golden(golden_ctx, "ref_silence_greedy")


def test_pipeline_golden_maxlen(golden_ctx, jfk_pcm):
    """-ml 16: max_len segment splitting during token-timestamp emission
    (reference: whisper_exp_compute_token_level_timestamps + split path)."""
    p = _params()
    p.max_len = 16
    assert golden_ctx.full(p, jfk_pcm) == 0
    _assert_matches_golden(golden_ctx, "ref_jfk_maxlen")


def test_pipeline_golden_offset_nt(golden_ctx):
    """-ot 3000 -nt: engine-level no_timestamps (all timestamp tokens
    suppressed in the logit chain, reference: src/whisper.cpp:5064-5068)
    combined with a seek offset.  Pins the decode AND the reference's
    accidental emission arithmetic: whisper_sample_token inits tid to 0
    (:5302-5304) and with -nt no timestamp prob ever exceeds 0, so
    t0 = seek + 2*(0 - token_beg) goes hugely negative — found by
    tools/difftest.py, reproduced bit-exactly."""
    rng = np.random.RandomState(3003)
    pcm_f = (rng.randn(16000 * 8) * 0.3).clip(-1, 1)
    pcm = ((pcm_f * 32767).astype(np.int16)).astype(np.float32) / 32768.0
    p = _params()
    p.offset_ms = 3000
    p.no_timestamps = True
    assert golden_ctx.full(p, pcm) == 0
    _assert_matches_golden(golden_ctx, "ref_noise8_offset_nt")


def test_pipeline_golden_dtw(tmp_path):
    """-dtw tiny.en: DTW token-level timestamps (t_dtw) end-to-end vs the
    binary — pins the cross-QK capture, alignment-head selection, median
    filter, and DTW backtrace on a 4-layer/6-head model whose dims admit
    the tiny.en aheads preset (reference: whisper.cpp:7269-7447).
    t_dtw is allowed +/-1 tick (10 ms): the attention weights feeding DTW
    go through f32 ggml GEMMs vs XLA kernels, and a single tie on the
    cost-matrix backtrace moves a boundary by one frame."""
    path = make_random_model(tmp_path, seed=7, ftype=1, d=96, heads=6,
                             enc_layers=2, dec_layers=4, n_audio_ctx=256)
    ctx = wt.WhisperContext.from_file(
        path, dtw_token_timestamps=True, dtw_aheads_preset="tiny.en")
    rng = np.random.RandomState(5)
    pcm_f = (rng.randn(16000 * 3) * 0.1).clip(-1, 1)
    pcm = ((pcm_f * 32767).astype(np.int16)).astype(np.float32) / 32768.0
    assert ctx.full(_params(), pcm) == 0

    ref = json.load(open(os.path.join(GOLDEN, "ref_noise3_dtw.json")))
    rt = ref["transcription"]
    assert ctx.full_n_segments() == len(rt)
    n_checked = 0
    for i, rseg in enumerate(rt):
        seg = ctx.result_all[i]
        assert seg.text == rseg["text"], f"seg {i} text"
        for j, (tok, rtok) in enumerate(zip(seg.tokens, rseg["tokens"])):
            assert tok.id == rtok["id"], f"seg {i} tok {j} id"
            if rtok["t_dtw"] >= 0:
                assert abs(tok.t_dtw - rtok["t_dtw"]) <= 1, \
                    f"seg {i} tok {j} t_dtw: ours {tok.t_dtw} " \
                    f"vs ref {rtok['t_dtw']}"
                n_checked += 1
    assert n_checked > 0, "golden contains no DTW-timestamped tokens"


def test_pipeline_golden_lang_auto(tmp_path, jfk_pcm):
    """-l auto: language auto-detect (one decode step over the lang-token
    block, reference: whisper_lang_auto_detect_with_state) must pick the
    SAME language as the binary and transcribe identically with it.
    Golden: whisper-cli -l auto -oj on the multilingual seed-7 model —
    the binary detected 'be' (p = 0.026118)."""
    path = make_random_model(tmp_path, seed=7, ftype=1, n_vocab=51865)
    ctx = wt.WhisperContext.from_file(path)
    ctx.pcm_to_mel(jfk_pcm)
    lid, probs = ctx.lang_auto_detect()
    assert wt.lang_str(lid) == "be", wt.lang_str(lid)
    assert probs[lid] == pytest.approx(0.026118, rel=0.02)

    p = _params()
    p.language = "auto"
    p.token_timestamps = False   # golden captured with -oj (not -ojf)
    assert ctx.full(p, jfk_pcm) == 0
    ref = json.load(open(os.path.join(GOLDEN, "ref_jfk_lang_auto.json")))
    assert ref["result"]["language"] == "be"
    rt = ref["transcription"]
    assert ctx.full_n_segments() == len(rt)
    for i, rseg in enumerate(rt):
        seg = ctx.result_all[i]
        assert seg.t0 * 10 == rseg["offsets"]["from"], f"seg {i} t0"
        assert seg.t1 * 10 == rseg["offsets"]["to"], f"seg {i} t1"
        assert seg.text == rseg["text"], f"seg {i} text"


def test_pipeline_golden_translate_de(tmp_path, jfk_pcm):
    """Multilingual model, -l de -tr: pins the language + task token
    prompt assembly (sot, lang_de, translate) against the binary."""
    path = make_random_model(tmp_path, seed=7, ftype=1, n_vocab=51865)
    ctx = wt.WhisperContext.from_file(path)
    p = _params()
    p.language = "de"
    p.translate = True
    assert ctx.full(p, jfk_pcm) == 0
    _assert_matches_golden(ctx, "ref_jfk_de_translate")

"""Differential fuzzer as a suite member (round-3 verdict ask #6).

Sweeps seeded random (audio x flag-combo) cases through the REAL
reference whisper-cli and our CLI, requiring segment-exact agreement
(reference spirit: tests/run-tests.sh's golden diff).  The corpus is
pinned by DIFFTEST_SEED so every run explores the same cases; bump the
seed deliberately when widening the corpus.

Divergence taxonomy (tools/difftest.py):
- structural diff (timestamps, segmentation, non-reconverging tokens,
  or lossy-container PCM past the documented LSB envelope):
  FAILS this test — zero are tolerated.
- benign near-tie: a single argmax flip between candidates within ~2%
  probability on random weights' near-flat distribution (f32 GEMM
  rounding, ggml vs XLA), timestamps identical, suffix re-converges —
  counted and reported, not a failure.
- lossy-rounding: an mp3/ogg case whose transcripts diverge while the
  PCM matches the reference's own compiled decoders within 2 s16 LSB —
  the two independent codec implementations (their f32 vs our f64) land
  on different rounding boundaries and random weights' ~0 logit margins
  amplify that into token flips.  Counted and BOUNDED, not a failure:
  the PCM parity check is the real decoder assertion, and wav/flac
  cases (bit-identical PCM) keep the engine held to exact transcripts.
"""

import os
import sys

import pytest

from conftest import build_reference_binary

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

DIFFTEST_SEED = 42      # pinned corpus; bump deliberately
DIFFTEST_CASES = 12


def test_differential_fuzz_vs_reference_binary():
    cli = build_reference_binary("whisper-cli")
    if cli is None:
        pytest.skip("reference whisper-cli could not be built")
    from difftest import run_difftest

    r = run_difftest(cli, n_cases=DIFFTEST_CASES, seed=DIFFTEST_SEED)
    assert r["n_error"] == 0, f"cases errored: {r}"
    assert r["n_diff"] == 0, f"structural divergence vs reference: {r}"
    # lossy-rounding flips must stay the rare tail, never the population
    assert r["n_lossy"] <= 3, f"too many lossy-rounding divergences: {r}"
    # the corpus actually ran
    assert r["n_cases"] == DIFFTEST_CASES

"""Energy-VAD / high-pass-filter / similarity goldens vs the reference's
own compiled code.

The numbers below were printed by a C++ harness linking the reference's
UNMODIFIED examples/common.cpp (vad_simple, high_pass_filter, similarity
— examples/common.cpp:601-676) built from /root/reference (see the
harness source inline below in this docstring's capture recipe).  Each
case is a seeded LCG noise buffer with an optionally silenced tail; the
golden pins (decision, post-HPF mean |x|) and Levenshtein scores.

Capture recipe: g++ harness.cpp -I reference/examples libcommon.a ...
with lcg_fill(seed)=s*1664525+1013904223, sample=(s>>8)/2^24-0.5)*amp.
"""

import numpy as np
import pytest

from whisper_tpu.audio.vad import high_pass_filter, similarity, vad_simple


def _lcg_noise(seed, n, amp):
    s = np.uint32(seed)
    out = np.empty(n, np.float32)
    a, c = np.uint32(1664525), np.uint32(1013904223)
    with np.errstate(over="ignore"):
        for i in range(n):
            s = np.uint32(s * a + c)
            out[i] = (float(s >> np.uint32(8)) / float(1 << 24) - 0.5) * amp
    return out


# (seed, n, amp, tail_silent_ms, last_ms, vad_thold, freq_thold,
#  ref_decision, ref_posthpf_mean_abs)
CASES = [
    (1, 16000 * 2, 0.2, 0,    1000, 0.6, 100.0, 0, 1.900520e-03),
    (2, 16000 * 2, 0.2, 1000, 1000, 0.6, 100.0, 1, 9.476800e-04),
    (3, 16000 * 3, 0.05, 500, 1250, 0.6, 100.0, 0, 3.923570e-04),
    (4, 16000 * 1, 0.3, 0,    1500, 0.6, 100.0, 0, 7.471874e-02),
    (5, 16000 * 2, 0.2, 800,  1000, 0.6, 0.0,   1, 2.978629e-02),
    (6, 16000 * 2, 0.2, 200,  1000, 0.1, 80.0,  0, 1.376989e-03),
]


@pytest.mark.parametrize("case", CASES, ids=[f"seed{c[0]}" for c in CASES])
def test_vad_simple_matches_reference(case):
    from whisper_tpu.audio.vad import _reference_high_pass

    seed, n, amp, tail_ms, last_ms, vt, ft, ref_dec, ref_energy = case
    pcm = _lcg_noise(seed, n, amp)
    tail = 16000 * tail_ms // 1000
    if tail:
        pcm[n - tail:] = 0.0
    dec = vad_simple(pcm.copy(), 16000, last_ms, vt, ft, verbose=False)
    assert int(dec) == ref_dec, case

    # pin the filtered content the decision was computed over.  The
    # reference's high_pass_filter collapses to [x0, alpha*x1, ...]
    # because it reads the already-overwritten previous sample
    # (common.cpp:601-613); _reference_high_pass reproduces that.  The
    # too-short case (4) returns before filtering, so its golden energy
    # is the RAW buffer's.
    if 16000 * last_ms // 1000 < n and ft > 0.0:
        filt = _reference_high_pass(pcm, ft, 16000)
    else:
        filt = pcm
    e = float(np.abs(filt.astype(np.float64)).mean())
    assert e == pytest.approx(ref_energy, rel=1e-3), case


def test_similarity_matches_reference():
    assert similarity("kitten", "sitting") == pytest.approx(0.571429,
                                                            abs=1e-6)
    assert similarity("turn on the lights",
                      "turn off the lights") == pytest.approx(0.894737,
                                                              abs=1e-6)
    assert similarity("", "abc") == pytest.approx(0.0, abs=1e-6)

"""End-to-end proof that the one-command WER harness is runnable.

tools/wer.sh mirrors the reference's tests/librispeech/{Makefile,eval.mk}
pipeline (reference: tests/librispeech/eval.py + eval.mk): CLI transcribes
every <utt>.flac to <utt>.flac.txt, eval.py normalizes and scores corpus
WER.  Real accuracy needs a trained checkpoint (unavailable here — zero
egress), so this test proves the harness itself: a synthetic two-utterance
LibriSpeech-layout dataset, a random-weight model, one wer.sh invocation,
and a parseable "WER: …%" line out the other end.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def librispeech_dir(tmp_path_factory):
    """Two-utterance dataset in the real LibriSpeech directory layout:
    <root>/<spk>/<chap>/<spk>-<chap>-<utt>.flac + <spk>-<chap>.trans.txt."""
    from flacgen import encode_flac

    root = tmp_path_factory.mktemp("LibriSpeech")
    chap = root / "84" / "121123"
    chap.mkdir(parents=True)

    rng = np.random.RandomState(7)
    for i, text in enumerate(["HELLO WORLD", "GOOD MORNING EVERYONE"]):
        t = np.arange(16000 * 2)
        tone = np.sin(t * (0.03 + 0.01 * i)) * 6000
        pcm = (tone + rng.randn(t.size) * 200).astype(np.int32)
        utt = chap / f"84-121123-{i:04d}.flac"
        utt.write_bytes(encode_flac(pcm, 16000))
    (chap / "84-121123.trans.txt").write_text(
        "84-121123-0000 HELLO WORLD\n"
        "84-121123-0001 GOOD MORNING EVERYONE\n")
    return root


def test_wer_sh_end_to_end(librispeech_dir, tmp_path):
    """bash tools/wer.sh <model> <dataset> produces hypothesis files and a
    corpus WER line, with nothing missing but the trained checkpoint."""
    from conftest import make_random_model

    model = make_random_model(tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHON=sys.executable)
    out = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "wer.sh"),
         str(model), str(librispeech_dir)],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout[-800:], out.stderr[-800:])

    # CLI wrote the reference-layout hypothesis files
    chap = librispeech_dir / "84" / "121123"
    for i in range(2):
        hyp = chap / f"84-121123-{i:04d}.flac.txt"
        assert hyp.exists(), f"missing CLI hypothesis {hyp}"

    m = re.search(r"WER: ([0-9.]+)%\s+\((\d+) utterances\)", out.stdout)
    assert m, f"no WER line in: {out.stdout!r}"
    assert int(m.group(2)) == 2
    float(m.group(1))  # parseable percentage


def test_eval_from_cli_outputs_scoring(librispeech_dir):
    """--from-cli-outputs scores pre-written hypotheses exactly: a perfect
    hypothesis set gives 0% WER, one substituted word gives 1/5."""
    chap = librispeech_dir / "84" / "121123"
    (chap / "84-121123-0000.flac.txt").write_text("Hello, world!\n")
    (chap / "84-121123-0001.flac.txt").write_text("good morning everyone\n")

    def run_eval():
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tests", "librispeech",
                                          "eval.py"),
             "--dataset", str(librispeech_dir), "--from-cli-outputs"],
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-500:]
        return float(re.search(r"WER: ([0-9.]+)%", out.stdout).group(1))

    assert run_eval() == 0.0

    (chap / "84-121123-0001.flac.txt").write_text("good evening everyone\n")
    assert abs(run_eval() - 20.0) < 1e-6  # 1 error / 5 reference words

"""Output-writer goldens: our CLI's txt/vtt/srt/csv/lrc files must be
BYTE-IDENTICAL to the reference whisper-cli's on the same transcription.

Goldens captured from the reference binary (built CPU-only from
/root/reference, see tools/capture_ref_goldens.py header) on the shared
seed-7 f16 random model over samples/jfk.wav:

    whisper-cli -m random-7.bin -f jfk.wav -nf -bs 1 -bo 1 \
        -otxt -ovtt -osrt -ocsv -olrc -of ref_jfk_fmt
    whisper-cli ... -ml 16 -ovtt -osrt -of ref_jfk_fmt_ml

This pins the WRITERS (reference: examples/cli/cli.cpp:382-883 —
timestamp rendering incl. comma vs dot decimal, csv quoting/escaping,
lrc mm:ss.xx truncation, srt numbering and blank-line layout) on top of
the already-golden-pinned transcription."""

import os
import subprocess
import sys

import pytest
from conftest import make_random_model

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
JFK = "/root/reference/samples/jfk.wav"


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return make_random_model(tmp_path_factory.mktemp("m"), seed=7, ftype=1)


def _run_cli(model_path, out_base, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "whisper_tpu.cli", "-m", str(model_path),
           "-f", JFK, "-nf", "-bs", "1", "-bo", "1",
           "-of", str(out_base), *extra]
    subprocess.run(cmd, check=True, capture_output=True, env=env,
                   timeout=900)


def test_writer_goldens(model_path, tmp_path):
    base = tmp_path / "out"
    _run_cli(model_path, base,
             ["-otxt", "-ovtt", "-osrt", "-ocsv", "-olrc"])
    for ext in ("txt", "vtt", "srt", "csv", "lrc"):
        ours = open(f"{base}.{ext}", "rb").read()
        ref = open(os.path.join(GOLDEN, f"ref_jfk_fmt.{ext}"), "rb").read()
        assert ours == ref, f".{ext} differs from the reference writer"


def test_writer_goldens_maxlen(model_path, tmp_path):
    """-ml 16 exercises the split-segment path through vtt/srt rendering."""
    base = tmp_path / "out"
    _run_cli(model_path, base, ["-ml", "16", "-ovtt", "-osrt"])
    for ext in ("vtt", "srt"):
        ours = open(f"{base}.{ext}", "rb").read()
        ref = open(os.path.join(GOLDEN, f"ref_jfk_fmt_ml.{ext}"),
                   "rb").read()
        assert ours == ref, f"-ml .{ext} differs from the reference writer"

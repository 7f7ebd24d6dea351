"""Foreign-language binding proof: Perl XS client of libwhisper_tpu.so.

The reference ships go/java/ruby bindings as thin whisper.h wrappers
(reference: bindings/go/whisper.go, bindings/ruby/, bindings/java/);
those toolchains are absent from this image.  Perl IS present, so
bindings/perl plays their role: a non-C, non-Python FFI client loading
the shared library at runtime (DynaLoader dlopen, the same mechanism
node-ffi/JNA/ruby-fiddle use) and transcribing through the engine.

Segments printed by the Perl client must equal the Python engine's for
the same deterministic config.
"""

import os
import shutil
import subprocess

import pytest

import whisper_tpu as wt
from conftest import make_random_model

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERL_DIR = os.path.join(ROOT, "bindings", "perl")
LIB = os.path.join(ROOT, "native", "libwhisper_tpu.so")

pytestmark = [
    pytest.mark.skipif(shutil.which("perl") is None, reason="no perl"),
    pytest.mark.skipif(shutil.which("xsubpp") is None, reason="no xsubpp"),
    pytest.mark.skipif(not os.path.exists(LIB),
                       reason="libwhisper_tpu not built"),
]


@pytest.fixture(scope="module")
def perl_module():
    so = os.path.join(PERL_DIR, "WhisperTPU.so")
    r = subprocess.run([os.path.join(PERL_DIR, "build.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(so):
        pytest.skip(f"perl binding build failed: {r.stderr[-300:]}")
    return so


def test_perl_client_transcribes_identically(perl_module, tmp_path,
                                             jfk_wav_path):
    model = make_random_model(tmp_path)

    env = dict(os.environ,
               LD_LIBRARY_PATH=os.path.join(ROOT, "native"),
               WHISPER_TPU_ROOT=ROOT,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    out = subprocess.run(
        ["perl", "-I", PERL_DIR,
         os.path.join(PERL_DIR, "transcribe.pl"), model, jfk_wav_path],
        env=env, capture_output=True, text=True, timeout=900,
        check=True).stdout
    perl_lines = [l for l in out.splitlines() if l.strip()]
    assert perl_lines, out

    # Python engine, same deterministic config as transcribe.pl
    from whisper_tpu.audio.io import load_wav
    pcm, _ = load_wav(jfk_wav_path)
    ctx = wt.WhisperContext.from_file(model)
    p = wt.full_default_params()
    p.print_progress = False
    p.language = "en"
    p.temperature_inc = 0.0
    assert ctx.full(p, pcm) == 0
    py_lines = [
        f"[{s.t0 / 100:.2f}s -> {s.t1 / 100:.2f}s]{s.text}"
        for s in ctx.result_all
    ]
    assert perl_lines == py_lines

"""C ABI (libwhisper_tpu.so): a real C program against the whisper.h
surface must reproduce the Python path's segments.

Compiles examples/c_demo.c, links against native/libwhisper_tpu.so (the
embedded-interpreter C ABI, native/wtpu_capi.cpp), runs it on the shared
random-weight model + jfk.wav, and compares the SEG| lines with
ctx.full() run in-process."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import whisper_tpu as wt
from conftest import make_random_model

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "native", "libwhisper_tpu.so")


@pytest.mark.skipif(not os.path.exists(LIB), reason="libwhisper_tpu not built")
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_c_demo_matches_python(tmp_path, jfk_pcm):
    model = make_random_model(tmp_path)

    exe = str(tmp_path / "c_demo")
    subprocess.run(
        ["gcc", os.path.join(ROOT, "examples", "c_demo.c"),
         "-I" + os.path.join(ROOT, "native"),
         "-L" + os.path.join(ROOT, "native"), "-lwhisper_tpu", "-o", exe],
        check=True)

    raw = str(tmp_path / "jfk.f32")
    np.asarray(jfk_pcm, np.float32).tofile(raw)

    env = dict(os.environ,
               LD_LIBRARY_PATH=os.path.join(ROOT, "native"),
               WHISPER_TPU_ROOT=ROOT,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    out = subprocess.run([exe, model, raw], env=env, capture_output=True,
                         text=True, timeout=540, check=True).stdout
    c_segs = [line.split("|")[1:4] for line in out.splitlines()
              if line.startswith("SEG|")]
    assert c_segs, out
    assert "tokenize ' and so' -> " in out
    assert "callback_segments=" in out

    ctx = wt.WhisperContext.from_file(model)
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    assert ctx.full(p, jfk_pcm) == 0
    py_segs = [[str(s.t0), str(s.t1), s.text]
               for s in ctx.result_all]
    assert c_segs == py_segs


@pytest.mark.skipif(not os.path.exists(LIB), reason="libwhisper_tpu not built")
def test_c_abi_exports_full_whisper_h():
    """Every function name in whisper.h must be an exported symbol of
    libwhisper_tpu.so (the golden list was grep'd from the reference
    header; capi.py parity is tested separately in test_capi)."""
    want = set(open(os.path.join(
        ROOT, "tests", "golden", "whisper_h_functions.txt")).read().split())
    out = subprocess.run(["nm", "-D", "--defined-only", LIB],
                         capture_output=True, text=True, check=True).stdout
    have = {line.split()[-1] for line in out.splitlines() if line.strip()}
    missing = sorted(want - have)
    assert not missing, f"missing C ABI symbols: {missing}"


@pytest.mark.skipif(not os.path.exists(LIB), reason="libwhisper_tpu not built")
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_c_abi_extended_surface(tmp_path):
    """Raw mel/encode/decode + logits, introspection, states, timings and
    the log callback through the C ABI (tests/c_abi_ext.c)."""
    model = make_random_model(tmp_path)
    exe = str(tmp_path / "c_abi_ext")
    subprocess.run(
        ["gcc", os.path.join(ROOT, "tests", "c_abi_ext.c"),
         "-I" + os.path.join(ROOT, "native"),
         "-L" + os.path.join(ROOT, "native"), "-lwhisper_tpu", "-o", exe],
        check=True)
    env = dict(os.environ,
               LD_LIBRARY_PATH=os.path.join(ROOT, "native"),
               WHISPER_TPU_ROOT=ROOT,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    out = subprocess.run([exe, model], env=env, capture_output=True,
                         text=True, timeout=900, check=True).stdout
    assert "DONE" in out, out
    lines = dict(l.split("|", 1) for l in out.splitlines()
                 if "|" in l and not l.startswith("GSEG|"))
    assert lines["MODEL"].startswith("51864|2|3|80|")
    assert lines["LANG"] == "99|en|english"
    assert lines["NLEN"] == "99" and lines["NLEN_ST"] == "99"
    assert lines["LOGITS"].endswith("|ok")
    assert lines["LOGITS_ST"] == "ok"
    assert lines["TIMINGS"] == "ok"
    assert lines["LOGS"] == "captured"

    # behavioral callbacks through the ABI (VERDICT r2 Next #4)
    n_base = int(lines["BASE_SEGS"])
    assert n_base > 0
    n_abort_calls, n_abort_segs = map(int, lines["ABORT"].split("|"))
    assert n_abort_calls == 1 and n_abort_segs == 0   # aborted before work
    n_encb_calls, n_encb_segs, encb_state_segs = map(
        int, lines["ENCB"].split("|"))
    assert n_encb_calls == 1 and n_encb_segs == 0     # veto gates encode
    # the whisper_state* handed to the callback is live: the C side called
    # whisper_full_n_segments_from_state(state) on it (regression: the
    # trampolines used to pass NULL, segfaulting conforming clients)
    assert encb_state_segs >= 0
    n_lfilt, lfilt_ok = lines["LFILT"].split("|")
    assert int(n_lfilt) > 0 and lfilt_ok == "ok"      # forced-token filter
    gram_ok, n_gram_chars = lines["GRAMMAR"].split("|")
    assert gram_ok == "ok" and int(n_gram_chars) > 0

    # in-struct C grammar must match the Python GBNF path byte-for-byte
    c_gsegs = [l[len("GSEG|"):] for l in out.splitlines()
               if l.startswith("GSEG|")]
    pcm = _c_lcg_noise(16000 * 8)
    ctx = wt.WhisperContext.from_file(model)
    from whisper_tpu.grammar import grammar_from_gbnf
    p = wt.full_default_params()
    p.print_progress = False
    p.temperature_inc = 0.0
    p.greedy.best_of = 1
    p.grammar_rules = grammar_from_gbnf("root ::= [a-z ]*")
    p.grammar_penalty = 100.0
    assert ctx.full(p, pcm) == 0
    py_gsegs = [s.text for s in ctx.result_all]
    assert c_gsegs == py_gsegs


def _c_lcg_noise(n):
    """Replicates fill_noise() in c_abi_ext.c (LCG, seed 12345)."""
    s = np.uint64(12345)
    a, c, m = np.uint64(1664525), np.uint64(1013904223), np.uint64(1 << 32)
    out = np.empty(n, np.float32)
    for i in range(n):
        s = (s * a + c) % m
        out[i] = (float(s >> np.uint64(8)) / float(1 << 24) - 0.5) * 0.2
    return out

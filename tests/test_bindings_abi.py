"""Language-binding ABI pins: go / ruby / java / javascript sources vs
the real libwhisper_tpu.so.

The go/java/ruby/node toolchains are absent from this image, so the
bindings cannot be compiled here (the Perl XS client is the in-image
runnable proof, tests/test_perl_binding.py).  What CAN be pinned
without those toolchains — and is, here:

  1. every whisper_* function a binding source references is an
     exported symbol of libwhisper_tpu.so (catches typos/drift);
  2. the generated Java layout table and abi_offsets.json match what
     the C compiler says TODAY (tools/gen_abi_offsets.py --check);
  3. every WhisperTpuLayout constant the Java binding uses exists in
     the generated table;
  4. the Ruby binding's flattened fiddle struct declaration produces
     the exact field offsets of the real whisper_full_params (compiled
     and compared offset-for-offset with gcc);
  5. the by-pointer forwards the ruby/java/node bindings call
     (whisper_full_ref & friends — whisper_tpu ABI extensions for FFI
     clients that cannot pass structs by value) produce segment output
     identical to the by-value originals, exercised end-to-end by a C
     driver linked against the .so.

Reference role models: bindings/go/whisper.go, bindings/ruby/ext/,
bindings/java/.../WhisperCppJnaLibrary.java, examples/addon.node/.
"""

import os
import re
import shutil
import subprocess
import sys

import pytest

from conftest import make_random_model

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "native", "libwhisper_tpu.so")
BINDINGS = os.path.join(ROOT, "bindings")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libwhisper_tpu not built")

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")

# Type / non-function identifiers that legitimately appear in binding
# sources but are not exported symbols.
TYPE_NAMES = {
    "whisper_context", "whisper_state", "whisper_full_params",
    "whisper_context_params", "whisper_token_data", "whisper_token",
    "whisper_pos", "whisper_seq_id", "whisper_ahead", "whisper_aheads",
    "whisper_grammar_element", "whisper_sampling_strategy",
    "whisper_gretype", "whisper_new_segment_callback",
    "whisper_progress_callback", "whisper_encoder_begin_callback",
    "whisper_abort_callback", "whisper_logits_filter_callback",
    "whisper_model_loader", "whisper_timings", "whisper_tpu",
    "whisper_tpu_log_callback", "whisper_alignment_heads_preset",
}

BINDING_SOURCES = [
    "go/whispertpu.go",
    "ruby/lib/whisper_tpu.rb",
    "java/WhisperTpu.java",
    "javascript/addon.cc",
    "perl/WhisperTPU.xs",
]


def _exports():
    out = subprocess.run(["nm", "-D", "--defined-only", LIB],
                         capture_output=True, text=True, check=True).stdout
    return {line.split()[-1] for line in out.splitlines() if line.strip()}


def test_binding_symbols_exported():
    exports = _exports()
    missing = {}
    for rel in BINDING_SOURCES:
        path = os.path.join(BINDINGS, rel)
        assert os.path.exists(path), f"binding source vanished: {rel}"
        text = open(path).read()
        refs = set(re.findall(r"\bwhisper_[a-z0-9_]+\b", text))
        bad = sorted(refs - exports - TYPE_NAMES)
        if bad:
            missing[rel] = bad
    assert not missing, f"bindings reference unexported symbols: {missing}"


@needs_gxx
def test_layout_artifacts_no_drift():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_abi_offsets.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, (
        "generated ABI layout artifacts drifted from the C compiler's "
        f"offsetof — rerun tools/gen_abi_offsets.py:\n{r.stderr}")


def test_java_layout_constants_exist():
    java = open(os.path.join(BINDINGS, "java", "WhisperTpu.java")).read()
    layout = open(os.path.join(BINDINGS, "java",
                               "WhisperTpuLayout.java")).read()
    declared = set(re.findall(r"public static final long (\w+)", layout))
    used = set(re.findall(r"WhisperTpuLayout\.([A-Z][A-Z0-9_]*)", java))
    missing = sorted(used - declared)
    assert not missing, f"Java binding uses undeclared layout consts: {missing}"


# flattened ruby field name -> real C member expression
_FLAT_TO_REAL = {
    "greedy_best_of": "greedy.best_of",
    "beam_search_beam_size": "beam_search.beam_size",
    "beam_search_patience": "beam_search.patience",
}


@needs_gxx
def test_ruby_flat_decl_matches_c_layout(tmp_path):
    rb = open(os.path.join(BINDINGS, "ruby", "lib", "whisper_tpu.rb")).read()
    m = re.search(r"FULL_PARAMS_DECL = \[(.*?)\]\.freeze", rb, re.S)
    assert m, "FULL_PARAMS_DECL not found in ruby binding"
    fields = re.findall(r'"([^"]+)"', m.group(1))
    assert len(fields) >= 50

    # Build a C program declaring the flat struct next to the real one
    # and diffing offsets.
    decl_lines, cmp_lines = [], []
    for f in fields:
        ctype, name = f.rsplit(" ", 1)
        ctype = {"void*": "void *", "size_t": "size_t"}.get(ctype, ctype)
        decl_lines.append(f"    {ctype} {name};")
        real = _FLAT_TO_REAL.get(name, name)
        cmp_lines.append(
            f'    if (offsetof(struct flat, {name}) != '
            f'offsetof(struct whisper_full_params, {real})) '
            f'{{ printf("MISMATCH {name}\\n"); bad = 1; }}')
    src = tmp_path / "flatchk.c"
    src.write_text(
        "#include <stdio.h>\n#include <stddef.h>\n"
        f'#include "{ROOT}/native/whisper_tpu.h"\n'
        "struct flat {\n" + "\n".join(decl_lines) + "\n};\n"
        "int main(void) {\n    int bad = 0;\n" + "\n".join(cmp_lines) + "\n"
        "    if (sizeof(struct flat) != sizeof(struct whisper_full_params))\n"
        '        { printf("MISMATCH sizeof\\n"); bad = 1; }\n'
        '    if (!bad) printf("OK\\n");\n    return bad;\n}\n')
    exe = str(tmp_path / "flatchk")
    subprocess.run(["g++", "-x", "c++", str(src), "-o", exe], check=True,
                   capture_output=True)
    r = subprocess.run([exe], capture_output=True, text=True)
    assert r.returncode == 0 and r.stdout.strip() == "OK", (
        f"ruby fiddle layout diverges from C: {r.stdout}")


FULL_REF_DRIVER = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "whisper_tpu.h"

/* by-value vs by-pointer entry points must produce identical segments */
int main(int argc, char ** argv) {
    if (argc != 2) return 2;

    struct whisper_context_params cp = whisper_context_default_params();
    struct whisper_context * ctx =
        whisper_init_from_file_with_params_ref(argv[1], &cp);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }

    int n = WHISPER_SAMPLE_RATE * 2;
    float * pcm = (float *) malloc(sizeof(float) * n);
    unsigned s = 12345;
    for (int i = 0; i < n; i++) {               /* deterministic noise */
        s = s * 1103515245u + 12345u;
        pcm[i] = ((float)(s >> 16 & 0x7fff) / 16384.0f - 1.0f) * 0.1f;
    }

    struct whisper_full_params * p =
        whisper_full_default_params_by_ref(WHISPER_SAMPLING_GREEDY);
    p->print_progress = false;
    p->temperature_inc = 0.0f;

    if (whisper_full_ref(ctx, p, pcm, n) != 0) {
        fprintf(stderr, "full_ref failed\n"); return 1;
    }
    int n_seg = whisper_full_n_segments(ctx);
    char first[4096] = {0};
    for (int i = 0; i < n_seg && strlen(first) < 3000; i++)
        strncat(first, whisper_full_get_segment_text(ctx, i),
                sizeof(first) - strlen(first) - 1);

    if (whisper_full(ctx, *p, pcm, n) != 0) {   /* by-value original */
        fprintf(stderr, "full failed\n"); return 1;
    }
    if (whisper_full_n_segments(ctx) != n_seg) {
        fprintf(stderr, "segment count diverged\n"); return 1;
    }
    char second[4096] = {0};
    for (int i = 0; i < n_seg && strlen(second) < 3000; i++)
        strncat(second, whisper_full_get_segment_text(ctx, i),
                sizeof(second) - strlen(second) - 1);
    if (strcmp(first, second) != 0) {
        fprintf(stderr, "text diverged:\n%s\n%s\n", first, second);
        return 1;
    }

    printf("MATCH n_segments=%d\n", n_seg);
    whisper_free_params(p);
    whisper_free(ctx);
    free(pcm);
    return 0;
}
"""


@needs_gxx
def test_full_ref_forwards_end_to_end(tmp_path):
    model = make_random_model(tmp_path)
    src = tmp_path / "full_ref_driver.c"
    src.write_text(FULL_REF_DRIVER)
    exe = str(tmp_path / "full_ref_driver")
    subprocess.run(
        ["g++", "-x", "c++", str(src),
         "-I" + os.path.join(ROOT, "native"),
         "-L" + os.path.join(ROOT, "native"), "-lwhisper_tpu",
         "-o", exe], check=True, capture_output=True)
    env = dict(os.environ,
               LD_LIBRARY_PATH=os.path.join(ROOT, "native"),
               WHISPER_TPU_ROOT=ROOT,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    r = subprocess.run([exe, model], env=env, capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-800:]
    assert r.stdout.startswith("MATCH n_segments="), r.stdout

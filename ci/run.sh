#!/bin/bash
# One-command CI gate (reference role: ci/run.sh:1-50 + the workflow
# matrix).  A fresh machine validates build + tests + bench smoke +
# multichip dryrun with:
#
#   ./ci/run.sh          # full gate (native build, pytest, bench, dryrun)
#   ./ci/run.sh quick    # skip the slow end-to-end pytest suite
#
# Exits nonzero on ANY regression.  Everything runs on the JAX CPU
# backend with an 8-device virtual mesh — no TPU, no network, no model
# downloads needed (tests use the reference stub models + random-weight
# models built on the fly).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu

step() { echo; echo "=== ci: $1 ==="; }

step "native build (libwtpu_audio / libwtpu_grammar / libwhisper_tpu)"
make -C native clean >/dev/null
make -C native

step "package import + version surface"
python -c "
import whisper_tpu as wt
assert hasattr(wt, 'WhisperContext') and hasattr(wt, 'full_default_params')
print('import ok')"

if [ "${1:-full}" != "quick" ]; then
    step "pytest (full suite, virtual 8-device CPU mesh)"
    python -m pytest tests/ -q -x
else
    step "pytest (quick: unit + parity subset)"
    python -m pytest tests/test_mel.py tests/test_filters.py \
        tests/test_loop_parity.py tests/test_batch_quality.py \
        tests/test_ggml_reader.py tests/test_quant.py -q -x
fi

step "bench smoke (tiny dims, serving + kernel, no ttfr children)"
python bench.py --size tiny --batch 2 --tokens 4 --serving-batch 2 \
    --mode both --no-ttfr --no-quality --iters 1 \
    | tail -n 1 | python -c "
import json, sys
rec = json.loads(sys.stdin.read())
assert rec['value'] > 0, rec
print('bench ok:', rec['metric'], rec['value'], rec['unit'])"

step "multichip dryrun (8-device virtual mesh, end-to-end orchestrator)"
python __graft_entry__.py

echo
echo "=== ci: ALL GREEN ==="

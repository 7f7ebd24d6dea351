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

step "bench driver rehearsal (the EXACT bare invocation, tiny dims via env)"
# The round-4 failure class: the default 'python bench.py' run outgrowing
# the driver's capture budget with nothing printed.  Rehearse the bare
# invocation under a wall-clock cap and assert the two survival
# guarantees: (1) partial records stream out as phases finish, so a hard
# kill still leaves a parseable record; (2) the final line parses and
# carries the headline value even when later phases are budget-skipped.
WTPU_BENCH_SIZE=tiny WTPU_BENCH_BATCH=2 WTPU_BENCH_TOKENS=4 \
WTPU_BENCH_SERVING_BATCH=2 WTPU_BENCH_ITERS=1 WTPU_BENCH_BUDGET_S=300 \
    timeout 360 python bench.py > /tmp/wtpu_ci_bench.out
python - <<'PY'
import json
lines = [l for l in open("/tmp/wtpu_ci_bench.out") if l.startswith("{")]
assert lines, "bench printed no JSON at all"
partials = [json.loads(l) for l in lines if '"partial": true' in l]
assert partials, "no per-phase partial records were flushed"
rec = json.loads(lines[-1])
assert not rec.get("partial"), "final record still marked partial"
assert rec.get("value", 0) > 0, rec
assert "budget_s" in rec and "bench_wall_s" in rec, rec
# the must-have metrics must survive even a tight budget: the headline
# serving value AND the kernel MFU number (kernel runs 2nd by design)
assert "kernel_rtf" in rec, rec
# ttfr must always leave a disposition: a measured warm/cold value, a
# per-child error, or an explanatory skip — never silent absence
assert any(k.startswith("ttfr_") for k in rec), rec
print(f"driver rehearsal ok: {len(partials)} partials, "
      f"value={rec['value']} {rec['unit']}, wall={rec['bench_wall_s']}s, "
      f"ttfr keys={[k for k in rec if k.startswith('ttfr_')]}")
PY

step "multichip dryrun (8-device virtual mesh, end-to-end orchestrator)"
python __graft_entry__.py

echo
echo "=== ci: ALL GREEN ==="

#!/bin/bash
# Run the bench tool across model sizes and print one share-able table
# (reference: scripts/bench-all.sh producing the bench-all-gg.txt tables).
#
# Usage: ./tools/bench_all.sh [models-dir] [size ...]
# With no model files present, sizes run with random weights at exact
# dims via bench.py (timing-faithful; this environment has no checkpoints).
set -eo pipefail

dir="${1:-models}"
shift 2>/dev/null || true
sizes=("$@")
[ ${#sizes[@]} -eq 0 ] && sizes=(tiny base small medium large-v3 large-v3-turbo)

echo "| model | device | Enc. | Dec. | Bch5 | PP |"
echo "| ---   | ---    | ---  | ---  | ---  | -- |"
for size in "${sizes[@]}"; do
    f="$dir/ggml-$size.bin"
    if [ -f "$f" ]; then
        python3 -m whisper_tpu.bench_tool -m "$f" | tail -n 1
    else
        python3 -m whisper_tpu.bench_tool --size "$size" | tail -n 1
    fi
done

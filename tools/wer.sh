#!/usr/bin/env bash
# One-command LibriSpeech WER: tools/wer.sh <model.bin> <librispeech-dir>
#                                           [extra whisper_tpu.cli flags...]
#
# Mirrors the reference's tests/librispeech/{Makefile,eval.mk} flow:
# the CLI transcribes every <utt>.flac into <utt>.flac.txt, then
# tests/librispeech/eval.py normalizes hypothesis + reference text and
# reports corpus WER.  One CLI process handles the whole file list, so
# the model loads (and the windows compile) exactly once.
#
# The only missing ingredient for a real WER number in this environment
# is a trained checkpoint — point $1 at one (e.g. ggml-tiny.en.bin from
# the reference's models/download-ggml-model.sh) and this script does the
# rest.  Extra flags after the dataset dir pass straight to the CLI
# (e.g. -bs 5 for beam search, -tp for temperature).
set -euo pipefail

if [ $# -lt 2 ]; then
    echo "usage: $0 <model.bin> <librispeech-dir> [cli flags...]" >&2
    exit 2
fi
MODEL=$1
DATASET=$2
shift 2

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}${PYTHONPATH:+:$PYTHONPATH}"
PY=${PYTHON:-python}

FLACS=()
while IFS= read -r f; do FLACS+=("$f"); done \
    < <(find "$DATASET" -name '*.flac' | sort)
if [ ${#FLACS[@]} -eq 0 ]; then
    echo "error: no .flac files under $DATASET" >&2
    exit 1
fi
echo "transcribing ${#FLACS[@]} utterances with $MODEL" >&2

ARGS=()
for f in "${FLACS[@]}"; do ARGS+=(-f "$f"); done
"$PY" -m whisper_tpu.cli --no-prints --language en --output-txt \
    --model "$MODEL" "$@" "${ARGS[@]}" >&2

"$PY" "$REPO/tests/librispeech/eval.py" --dataset "$DATASET" \
    --from-cli-outputs

#!/bin/bash
# Golden-diff integration harness (reference: tests/run-tests.sh).
#
# Transcribes known audio with a real model and word-diffs against the
# committed reference transcripts (tests/en-*-ref.txt from the reference
# repo).  Requires a real (non-stub) ggml model and sample audio; in
# environments without model weights it degrades to the stub smoke run.
#
# Usage: ./tests/run-tests.sh <model.bin> [audio.wav ...]

set -e
cd "$(dirname "$0")/.."

MODEL=${1:-/root/reference/models/for-tests-ggml-tiny.en.bin}
shift || true
AUDIO=${@:-/root/reference/samples/jfk.wav}

for wav in $AUDIO; do
    base=$(basename "$wav" .wav)
    echo "=== $wav ==="
    python3 -m whisper_tpu.cli -m "$MODEL" -f "$wav" -otxt -of "/tmp/wtpu-$base" -np
    ref="/root/reference/tests/en-0-ref.txt"
    if [ -f "$ref" ] && [ -s "/tmp/wtpu-$base.txt" ]; then
        echo "--- word diff vs $ref ---"
        git diff --no-index --word-diff=color --word-diff-regex='\w+' \
            "$ref" "/tmp/wtpu-$base.txt" || true
    else
        echo "(no reference transcript or empty output — stub model run)"
        cat "/tmp/wtpu-$base.txt"
    fi
done
echo "done"

#!/bin/bash
# Record from the microphone until Ctrl+C, then render a karaoke video via
# the CLI's -owts writer (which emits an ffmpeg drawtext script; reference:
# examples/generate-karaoke.sh).
#
# Usage: ./generate-karaoke.sh [model.bin] [font.ttf]
set -eo pipefail

model="${1:-models/ggml-base.en.bin}"
font="${2:-/usr/share/fonts/truetype/freefont/FreeMono.ttf}"

command -v ffmpeg >/dev/null || { echo "ffmpeg is required"; exit 1; }
[ -f "$model" ] || { echo "model not found: $model"; exit 1; }

echo "Recording... press Ctrl+C to stop"
if command -v sox >/dev/null; then
    sox -d -r 16000 -c 1 -b 16 /tmp/karaoke.wav || true
else
    # ffmpeg ALSA fallback when sox isn't installed
    ffmpeg -y -loglevel quiet -f alsa -i default -ac 1 -ar 16000 \
        /tmp/karaoke.wav || true
fi

python3 -m whisper_tpu.cli -m "$model" -owts --font-path "$font" \
    -f /tmp/karaoke.wav
sh /tmp/karaoke.wav.wts
echo "Wrote /tmp/karaoke.wav.mp4"

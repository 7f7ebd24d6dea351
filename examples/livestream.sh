#!/bin/bash
# Transcribe an audio livestream (HLS/HTTP/anything ffmpeg can read).
#
# TPU-native twist on the reference helper (reference:
# examples/livestream.sh): instead of looping "record N seconds to a file,
# run the CLI on it", ffmpeg decodes the stream to s16le PCM and pipes it
# straight into whisper_tpu.stream, which does real sliding-window
# streaming (step/keep carry, optional VAD) on the device.
#
# Usage: ./livestream.sh URL [step_s] [model.bin]
set -eo pipefail

url="${1:-http://a.files.bbci.co.uk/media/live/manifesto/audio/simulcast/hls/nonuk/sbr_low/ak/bbc_world_service.m3u8}"
step_s="${2:-30}"
model="${3:-models/ggml-base.en.bin}"

command -v ffmpeg >/dev/null || { echo "ffmpeg is required"; exit 1; }
[ -f "$model" ] || { echo "model not found: $model (tools/download_model.py)"; exit 1; }
[ -z "$1" ] && echo "No url given; defaulting to BBC World Service: $url"

# -re paces the decode at stream rate; stream.py reads s16le mono 16 kHz
ffmpeg -loglevel quiet -re -i "$url" -f s16le -ac 1 -ar 16000 - \
    | python3 -m whisper_tpu.stream -m "$model" --step $((step_s * 1000))

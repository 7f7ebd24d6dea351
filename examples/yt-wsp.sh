#!/bin/bash
# Download a video/VOD with yt-dlp, convert to 16 kHz wav, transcribe with
# the whisper_tpu CLI, leaving .vtt/.srt next to the download.
# (reference: examples/yt-wsp.sh)
#
# Usage:
#   [MODEL=models/ggml-large-v3.bin] [WHISPER_LANG=auto] ./yt-wsp.sh <url>
set -Eeuo pipefail

msg() { echo >&2 -e "${1-}"; }

if [ $# -lt 1 ] || [ "${1-}" = "help" ] || [ "${1-}" = "--help" ]; then
    msg "Usage: $0 <video-url>"
    msg "Env:   MODEL (default models/ggml-base.en.bin), WHISPER_LANG (default auto)"
    exit 1
fi

model="${MODEL:-models/ggml-base.en.bin}"
lang="${WHISPER_LANG:-auto}"

command -v yt-dlp >/dev/null || { msg "yt-dlp is required"; exit 1; }
command -v ffmpeg >/dev/null || { msg "ffmpeg is required"; exit 1; }
[ -f "$model" ] || { msg "model not found: $model (tools/download_model.py)"; exit 1; }

temp_dir="$(mktemp -d yt-wsp-XXXX)"
trap 'rm -rf "$temp_dir"' EXIT

msg "Downloading VOD..."
yt-dlp -f bestaudio --no-playlist -o "$temp_dir/vod.%(ext)s" "$1"

msg "Converting to 16 kHz wav..."
ffmpeg -loglevel quiet -y -i "$temp_dir"/vod.* \
    -ac 1 -ar 16000 -c:a pcm_s16le "$temp_dir/vod.wav"

msg "Transcribing..."
python3 -m whisper_tpu.cli -m "$model" -l "$lang" \
    --output-vtt --output-srt -of "vod" -f "$temp_dir/vod.wav"

msg "Done: vod.vtt / vod.srt"

#!/bin/bash
# Caption a twitch.tv livestream (reference: examples/twitch.sh, which
# records N-second chunks and runs the CLI per chunk; here streamlink's
# audio feed is piped continuously into whisper_tpu.stream).
#
# Requires streamlink (pip install streamlink) and ffmpeg.
set -eo pipefail

step=10
model="models/ggml-base.en.bin"

usage() {
    echo "Usage: $0 [-s step_s] [-m model.bin] url"
    exit 1
}
while getopts "s:m:h" opt; do
    case $opt in
        s) step=$OPTARG ;;
        m) model=$OPTARG ;;
        *) usage ;;
    esac
done
shift $((OPTIND - 1))
[ $# -eq 1 ] || usage
url="$1"

command -v streamlink >/dev/null || { echo "streamlink is required"; exit 1; }
command -v ffmpeg >/dev/null || { echo "ffmpeg is required"; exit 1; }
[ -f "$model" ] || { echo "model not found: $model"; exit 1; }

streamlink --stdout "$url" audio_only \
    | ffmpeg -loglevel quiet -i - -f s16le -ac 1 -ar 16000 - \
    | python3 -m whisper_tpu.stream -m "$model" --step $((step * 1000))

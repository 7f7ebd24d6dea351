#!/usr/bin/env python3
"""Download ggml Whisper models (download-ggml-model.sh equivalent,
reference: models/download-ggml-model.sh).

Fetches from the same Hugging Face repository the reference uses
(ggerganov/whisper.cpp).  Requires network access.

Usage: python tools/download_model.py tiny.en [out_dir]
"""

import sys
import urllib.request

MODELS = [
    "tiny", "tiny.en", "tiny-q5_1", "tiny.en-q5_1", "tiny-q8_0",
    "base", "base.en", "base-q5_1", "base.en-q5_1", "base-q8_0",
    "small", "small.en", "small.en-tdrz", "small-q5_1", "small.en-q5_1",
    "small-q8_0", "medium", "medium.en", "medium-q5_0", "medium.en-q5_0",
    "medium-q8_0", "large-v1", "large-v2", "large-v2-q5_0", "large-v2-q8_0",
    "large-v3", "large-v3-q5_0", "large-v3-turbo", "large-v3-turbo-q5_0",
    "large-v3-turbo-q8_0",
]
BASE = "https://huggingface.co/ggerganov/whisper.cpp/resolve/main"


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in MODELS:
        print("usage: download_model.py <model> [out_dir]\n\nmodels:",
              " ".join(MODELS), file=sys.stderr)
        return 1
    name = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    url = f"{BASE}/ggml-{name}.bin"
    out = f"{out_dir}/ggml-{name}.bin"
    print(f"downloading {url} -> {out}", file=sys.stderr)
    urllib.request.urlretrieve(url, out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Convert an openai/whisper .pt checkpoint to the legacy ggml container.

Equivalent of the reference converter (reference:
models/convert-pt-to-ggml.py): the .pt file stores `dims` and
`model_state_dict` with the same tensor names ggml uses, so conversion is
hparams + vocab + dump.  The vocab comes from a tiktoken file
(gpt2.tiktoken / multilingual.tiktoken from the openai/whisper assets) —
base64 token + rank per line.

Usage:
    python tools/convert_openai_pt.py model.pt vocab.tiktoken out.bin [--f32]
"""

import argparse
import base64
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def read_tiktoken(path: str) -> list[bytes]:
    tokens = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, _, rank = line.partition(b" ")
            tokens[int(rank)] = base64.b64decode(tok_b64)
    return [tokens[i] for i in range(len(tokens))]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pt_path")
    ap.add_argument("vocab_path", help="gpt2.tiktoken or multilingual.tiktoken")
    ap.add_argument("out")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import torch

    from whisper_tpu.audio.filters import mel_filterbank
    from whisper_tpu.weights.ggml_writer import write_ggml

    ckpt = torch.load(args.pt_path, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    hparams = {
        "n_vocab": dims["n_vocab"],
        "n_audio_ctx": dims["n_audio_ctx"],
        "n_audio_state": dims["n_audio_state"],
        "n_audio_head": dims["n_audio_head"],
        "n_audio_layer": dims["n_audio_layer"],
        "n_text_ctx": dims["n_text_ctx"],
        "n_text_state": dims["n_text_state"],
        "n_text_head": dims["n_text_head"],
        "n_text_layer": dims["n_text_layer"],
        "n_mels": dims["n_mels"],
    }

    tensors = {}
    for name, t in ckpt["model_state_dict"].items():
        # openai names == ggml names modulo the alignment-heads buffer
        if name == "alignment_heads":
            continue
        tensors[name] = t.to(torch.float32).numpy()

    tokens = read_tiktoken(args.vocab_path)
    filters = mel_filterbank(hparams["n_mels"])
    write_ggml(args.out, hparams, filters, tokens, tensors,
               ftype=0 if args.f32 else 1)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

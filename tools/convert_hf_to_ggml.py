#!/usr/bin/env python3
"""Convert a HuggingFace Whisper checkpoint to the legacy ggml container.

Equivalent of the reference converter (reference:
models/convert-h5-to-ggml.py): reads a transformers WhisperForConditional-
Generation directory (config.json + weights + vocab.json/added_tokens.json)
and writes a ggml .bin loadable by both this framework and whisper.cpp.

The mel filterbank is computed from scratch (whisper_tpu/audio/filters.py,
bit-matched to the openai assets); HF byte-level BPE vocab entries are
converted back to raw bytes.

Usage:
    python tools/convert_hf_to_ggml.py <hf_model_dir> <out.bin> [--f32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_state_dict(model_dir: str):
    """Load tensors without instantiating the model (safetensors or torch)."""
    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors import safe_open
        out = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k))
        return out
    if os.path.exists(pt_path):
        import torch
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found in {model_dir}")


def load_vocab(model_dir: str, n_vocab: int) -> list[bytes]:
    from whisper_tpu.tokenizer import hf_token_to_bytes
    vocab_path = os.path.join(model_dir, "vocab.json")
    with open(vocab_path, encoding="utf-8") as f:
        tok_to_id = json.load(f)
    max_id = max(tok_to_id.values())
    tokens: list[bytes] = [b""] * (max_id + 1)
    for tok, tid in tok_to_id.items():
        try:
            tokens[tid] = hf_token_to_bytes(tok)
        except KeyError:
            tokens[tid] = tok.encode("utf-8")
    return tokens


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("out")
    ap.add_argument("--f32", action="store_true",
                    help="store weights as f32 (default f16)")
    args = ap.parse_args()

    from whisper_tpu.audio.filters import mel_filterbank
    from whisper_tpu.weights.ggml_writer import write_ggml
    from whisper_tpu.weights.hf import hf_name_to_ggml

    with open(os.path.join(args.model_dir, "config.json")) as f:
        config = json.load(f)

    hparams = {
        "n_vocab": config["vocab_size"],
        "n_audio_ctx": config["max_source_positions"],
        "n_audio_state": config["d_model"],
        "n_audio_head": config["encoder_attention_heads"],
        "n_audio_layer": config["encoder_layers"],
        "n_text_ctx": config["max_target_positions"],
        "n_text_state": config["d_model"],
        "n_text_head": config["decoder_attention_heads"],
        "n_text_layer": config["decoder_layers"],
        "n_mels": config["num_mel_bins"],
    }

    sd = load_state_dict(args.model_dir)
    tensors = {}
    for hf_name, arr in sd.items():
        name = hf_name_to_ggml(hf_name)
        if name is None:
            continue
        tensors[name] = np.asarray(arr, dtype=np.float32)

    filters = mel_filterbank(hparams["n_mels"])
    tokens = load_vocab(args.model_dir, hparams["n_vocab"])

    write_ggml(args.out, hparams, filters, tokens, tensors,
               ftype=0 if args.f32 else 1)
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.1f} MB, "
          f"{hparams['n_audio_layer']} enc / {hparams['n_text_layer']} dec "
          f"layers, vocab {hparams['n_vocab']})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Create a stub test model: real hparams/filters/vocab, zero tensors.

Equivalent of the reference's `models/for-tests-ggml-*.bin` fixtures
(reference: tests/CMakeLists.txt:16-90) — the engine detects `n_loaded == 0`
and short-circuits decoding, so CI validates load/mel/pipeline plumbing
without weights.

Usage:
    # strip an existing model to a stub
    python tools/make_stub_model.py --from-model ggml-tiny.en.bin out.bin
    # or synthesize one from named dims (vocab borrowed from a stub donor)
    python tools/make_stub_model.py --dims tiny.en --donor for-tests-ggml-tiny.en.bin out.bin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = {
    "tiny": (51865, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "tiny.en": (51864, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "base": (51865, 1500, 512, 8, 6, 448, 512, 8, 6, 80),
    "base.en": (51864, 1500, 512, 8, 6, 448, 512, 8, 6, 80),
    "small": (51865, 1500, 768, 12, 12, 448, 768, 12, 12, 80),
    "small.en": (51864, 1500, 768, 12, 12, 448, 768, 12, 12, 80),
    "medium": (51865, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80),
    "medium.en": (51864, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80),
    "large-v2": (51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80),
    "large-v3": (51866, 1500, 1280, 20, 32, 448, 1280, 20, 32, 128),
    "large-v3-turbo": (51866, 1500, 1280, 20, 32, 448, 1280, 20, 4, 128),
}
KEYS = ("n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
        "n_audio_layer", "n_text_ctx", "n_text_state", "n_text_head",
        "n_text_layer", "n_mels")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--from-model", help="strip this model's tensors")
    ap.add_argument("--dims", choices=list(DIMS))
    ap.add_argument("--donor", help="model file providing vocab/filters "
                                    "(with --dims)")
    args = ap.parse_args()

    from whisper_tpu.audio.filters import mel_filterbank
    from whisper_tpu.quantize import _count_file_tokens
    from whisper_tpu.weights.ggml_reader import read_ggml_file
    from whisper_tpu.weights.ggml_writer import write_ggml

    if args.from_model:
        mf = read_ggml_file(args.from_model)
        hp = mf.hparams
        hparams = {k: getattr(hp, k) for k in KEYS}
        filters = mf.filters
        n_file = _count_file_tokens(args.from_model)
        tokens = [mf.vocab.id_to_token[i] for i in range(n_file)]
    else:
        if not (args.dims and args.donor):
            print("need --from-model, or --dims with --donor", file=sys.stderr)
            return 1
        hparams = dict(zip(KEYS, DIMS[args.dims]))
        donor = read_ggml_file(args.donor)
        n_file = _count_file_tokens(args.donor)
        tokens = [donor.vocab.id_to_token[i]
                  for i in range(min(n_file, hparams["n_vocab"]))]
        filters = mel_filterbank(hparams["n_mels"])

    write_ggml(args.out, hparams, filters, tokens, tensors={}, ftype=1)
    print(f"wrote stub {args.out} "
          f"({os.path.getsize(args.out) / 1e3:.0f} KB)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

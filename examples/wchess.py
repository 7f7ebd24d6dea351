#!/usr/bin/env python3
"""Grammar-constrained chess-move dictation (wchess equivalent,
reference: examples/wchess).

Transcribes an utterance constrained to legal-move phrasing via
grammars/chess.gbnf and prints the recognized move.

Usage: python examples/wchess.py -m model.bin -f move.wav
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_tpu.api import WhisperContext
from whisper_tpu.audio.io import load_audio
from whisper_tpu.command import transcribe_utterance
from whisper_tpu.grammar import grammar_from_gbnf

GRAMMAR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "grammars", "chess.gbnf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("--grammar-penalty", type=float, default=100.0)
    args = ap.parse_args()

    ctx = WhisperContext.from_file(args.model)
    grammar = grammar_from_gbnf(open(GRAMMAR).read())
    pcm, _ = load_audio(args.file)
    move = transcribe_utterance(ctx, pcm, grammar=grammar,
                                grammar_penalty=args.grammar_penalty,
                                initial_prompt="knight to e4, pawn takes d5.")
    print(f"move: '{move.strip()}'")
    return 0


if __name__ == "__main__":
    sys.exit(main())

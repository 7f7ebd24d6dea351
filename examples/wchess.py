#!/usr/bin/env python3
"""Voice-driven chess (wchess equivalent, reference: examples/wchess).

A full game loop mirroring WChess::run (libwchess/WChess.cpp:41-171):
the board regenerates a GBNF grammar of currently-legal moves after
every ply, each utterance is decoded under that grammar with the
reference's decode configuration (wchess.cmd.cpp:203-225: greedy t=0,
temperature_inc 2.0, max_tokens 32, audio_ctx 768, single segment), the
transcription is applied to the board, and the updated board is printed.

Audio sources: one or more wav files (one utterance each) via -f, or raw
s16le stdin segmented by energy VAD (no SDL microphone here).

Usage: python examples/wchess.py -m model.bin -f e4.wav -f e5.wav ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_tpu.api import SamplingStrategy, WhisperContext, full_default_params
from whisper_tpu.audio.io import load_audio
from whisper_tpu.chessboard import Chessboard
from whisper_tpu.grammar import grammar_from_gbnf


def transcribe_move(ctx, pcm, grammar_text, grammar_penalty):
    """One grammar-constrained utterance (WChess::transcribe +
    wchess.cmd.cpp wparams)."""
    import numpy as np

    # pad to the reference's minimum window (WChess.cpp:105-106)
    min_size = int(1.2 * 16000)
    if len(pcm) < min_size:
        pcm = np.concatenate(
            [np.zeros(min_size - len(pcm), np.float32), pcm])

    p = full_default_params(SamplingStrategy.GREEDY)
    p.print_progress = False
    p.translate = False
    p.no_context = True
    p.single_segment = True
    p.no_timestamps = True
    p.max_tokens = 32
    # the reference hardcodes 768 (real models have 1500); clamp for the
    # tiny-context test models
    p.audio_ctx = min(768, ctx.n_audio_ctx())
    p.temperature = 0.0
    p.temperature_inc = 2.0
    p.greedy.best_of = 1
    p.beam_search.beam_size = 1
    p.language = "en"
    p.grammar_penalty = grammar_penalty
    p.grammar_rules = grammar_from_gbnf(grammar_text, "move")
    if ctx.full(p, pcm) != 0:
        return ""
    return "".join(ctx.full_get_segment_text(i)
                   for i in range(ctx.full_n_segments())).strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", action="append", default=[],
                    help="wav utterance (repeatable); default raw s16le stdin")
    ap.add_argument("--grammar-penalty", type=float, default=100.0)
    ap.add_argument("--moves", default=None,
                    help="comma-separated typed moves instead of audio "
                         "(board/grammar demo without a model decode)")
    args = ap.parse_args()

    board = Chessboard()

    if args.moves:
        for cmd in args.moves.split(","):
            res = board.process(cmd.strip())
            print(f"{cmd.strip()!r} -> {res or '(illegal)'}")
            print(board.stringify_board())
            if not board.grammar():
                print("No more moves possible")
                break
        return 0

    ctx = WhisperContext.from_file(args.model)

    if args.file:
        utterances = (load_audio(f)[0] for f in args.file)
    else:
        from whisper_tpu.command import _vad_utterances_stdin
        utterances = _vad_utterances_stdin(0.6, 100.0)

    print(board.stringify_board())
    for pcm in utterances:
        grammar_text = board.grammar()
        if not grammar_text:
            print("No more moves possible")
            break
        heard = transcribe_move(ctx, pcm, grammar_text,
                                args.grammar_penalty)
        move = board.process(heard)
        print(f"heard: '{heard}' -> {move or '(not a legal move)'}")
        if move:
            print(board.stringify_board())
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""LibriSpeech WER evaluation harness.

Equivalent of the reference harness (reference: tests/librispeech/eval.py +
Makefile): transcribe every utterance of LibriSpeech test-clean with the
CLI, normalize hypothesis and reference with an English text normalizer,
and report corpus WER.

jiwer is not available in this environment, so WER is computed with a
plain word-level Levenshtein; the normalizer implements the core of
OpenAI's EnglishTextNormalizer (lowercase, punctuation, contractions,
number-agnostic word forms).

Usage:
    python tests/librispeech/eval.py --model ggml-tiny.en.bin \
        --dataset /path/to/LibriSpeech/test-clean [--limit N]

Dataset layout: <dataset>/<spk>/<chap>/<spk>-<chap>-<utt>.flac plus
<spk>-<chap>.trans.txt transcription files.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

# -- normalizer (subset of openai/whisper EnglishTextNormalizer) -----------

_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "let's": "let us",
    "ain't": "aint", "y'all": "you all", "wanna": "want to",
    "gotta": "got to", "gonna": "going to", "i'ma": "i am going to",
    "imma": "i am going to",
}
_SUFFIXES = [("'s", " s"), ("'re", " are"), ("'ve", " have"),
             ("'m", " am"), ("'ll", " will"), ("'d", " would"),
             ("n't", " not")]


def normalize_english(text: str) -> str:
    s = text.lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)      # remove bracketed tags
    s = re.sub(r"\(([^)]+?)\)", "", s)
    for k, v in _CONTRACTIONS.items():
        s = s.replace(k, v)
    for suf, rep in _SUFFIXES:
        s = re.sub(rf"(\w){re.escape(suf)}\b", rf"\1{rep}", s)
    s = re.sub(r"[^a-z0-9' ]", " ", s)
    s = re.sub(r"\s+", " ", s).strip()
    return s


def word_error_rate(refs: list[str], hyps: list[str]) -> float:
    """Corpus WER: total edit distance / total reference words."""
    total_err = 0
    total_words = 0
    for ref, hyp in zip(refs, hyps):
        r = ref.split()
        h = hyp.split()
        d = _levenshtein(r, h)
        total_err += d
        total_words += len(r)
    return total_err / max(1, total_words)


def _levenshtein(a: list[str], b: list[str]) -> int:
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (wa != wb))
        prev = cur
    return prev[-1]


# -- harness -----------------------------------------------------------------

def collect_utterances(dataset: str):
    for root, _dirs, files in os.walk(dataset):
        trans = [f for f in files if f.endswith(".trans.txt")]
        for tf in trans:
            with open(os.path.join(root, tf)) as f:
                for line in f:
                    utt_id, _, text = line.strip().partition(" ")
                    flac = os.path.join(root, utt_id + ".flac")
                    if os.path.exists(flac):
                        yield flac, text


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="ggml model (required unless --from-cli-outputs)")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8,
                    help="streams decoded concurrently (BatchTranscriber)")
    ap.add_argument("--beam-size", type=int, default=-1)
    ap.add_argument("--from-cli-outputs", action="store_true",
                    help="score pre-existing <utt>.flac.txt hypothesis "
                         "files written by the CLI (the reference's "
                         "eval.mk flow) instead of transcribing here")
    args = ap.parse_args()

    if args.from_cli_outputs:
        # Mirrors the reference's eval.py get_hypothesis(): hypotheses are
        # the <utt>.flac.txt files the CLI wrote next to each .flac
        # (reference: tests/librispeech/eval.py:16-23 + eval.mk %.flac.txt).
        utts = list(collect_utterances(args.dataset))
        if args.limit:
            utts = utts[:args.limit]
        refs, hyps, missing = [], [], 0
        for flac, ref in utts:
            hyp_path = flac + ".txt"
            if not os.path.exists(hyp_path):
                missing += 1
                continue
            with open(hyp_path) as f:
                hyp = f.read().strip()
            refs.append(normalize_english(ref))
            hyps.append(normalize_english(hyp))
        if missing:
            print(f"warning: {missing} utterances without .flac.txt "
                  "hypothesis, skipped", file=sys.stderr)
        if not refs:
            print("no scored utterances", file=sys.stderr)
            return 1
        wer = word_error_rate(refs, hyps)
        print(f"WER: {wer * 100:.2f}%  ({len(refs)} utterances)")
        return 0

    if not args.model:
        ap.error("--model is required unless --from-cli-outputs")

    import whisper_tpu as wt
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.parallel.batch import BatchTranscriber

    utts = list(collect_utterances(args.dataset))
    if args.limit:
        utts = utts[:args.limit]
    if not utts:
        print("no utterances found", file=sys.stderr)
        return 1
    print(f"evaluating {len(utts)} utterances", file=sys.stderr)

    ctx = wt.WhisperContext.from_file(args.model)
    params = wt.full_default_params(
        wt.SamplingStrategy.BEAM_SEARCH if args.beam_size > 1
        else wt.SamplingStrategy.GREEDY)
    params.print_progress = False
    params.language = "en"
    params.beam_search.beam_size = args.beam_size

    refs, hyps = [], []
    if args.batch > 1 and args.beam_size <= 1:
        bt = BatchTranscriber(ctx, batch_size=args.batch, params=params)
        for i in range(0, len(utts), args.batch):
            chunk = utts[i:i + args.batch]
            streams = [load_audio(f)[0] for f, _ in chunk]
            results = bt.transcribe(streams)
            for (f, ref), segs in zip(chunk, results):
                hyp = "".join(s.text for s in segs)
                refs.append(normalize_english(ref))
                hyps.append(normalize_english(hyp))
    else:
        for f, ref in utts:
            pcm, _ = load_audio(f)
            ctx.full(params, pcm)
            hyp = "".join(ctx.full_get_segment_text(i)
                          for i in range(ctx.full_n_segments()))
            refs.append(normalize_english(ref))
            hyps.append(normalize_english(hyp))

    wer = word_error_rate(refs, hyps)
    print(f"WER: {wer * 100:.2f}%  ({len(refs)} utterances)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

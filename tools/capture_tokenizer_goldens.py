#!/usr/bin/env python3
"""Capture byte-exact tokenizer goldens from the reference libwhisper.

Builds tools/ref_tokenize.c against the reference build's libwhisper.so,
runs whisper_tokenize (reference: src/whisper.cpp:3283-3331) on the
adversarial corpus below with the stub models (REAL vocab, zero weights),
and writes tests/golden/ref_tokenizer.json.

Usage: python tools/capture_tokenizer_goldens.py [/path/to/refbuild]
       (default refbuild: /tmp/refbuild)
"""

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = ROOT / "tests" / "golden"
REF = pathlib.Path("/root/reference")

# Adversarial corpus: exercises every branch of the reference regex
# ('s|'t|'re|'ve|'m|'ll|'d| ?[[:alpha:]]+| ?[[:digit:]]+|
#  ?[^\s[:alpha:][:digit:]]+|\s+(?!\S)|\s+) under its C-locale byte
# semantics (non-ASCII bytes are NOT [:alpha:]), plus greedy
# longest-substring vocab matching.
CORPUS = [
    "Hello world",
    " Hello, world!",
    "hello",
    "HELLO WORLD",
    # contractions (the seven special-cased suffixes)
    "don't",
    "it's we're I'll you've I'm I'd shan't",
    "'s 't 're at start",
    # digits and digit/alpha boundaries
    "1234",
    "3.14159",
    "a1b2c3",
    "42nd street, 10,000 people",
    "2026-08-17 07:00:00",
    # punctuation runs
    "...",
    "--",
    "&&||==!=",
    "[bracketed] (parens) {braces} <angle>",
    "a--b++c",
    # whitespace shapes
    "  leading",
    "trailing  ",
    "   ",
    "a\tb\nc",
    "line1\n\nline2",
    "a  b   c",
    # unicode: non-ASCII bytes fall into the punct class in the reference
    "café",
    "naïve résumé",
    "Zürich über alles",
    "日本語のテスト",
    "Привет мир",
    "abcабвxyz",
    "👍 emoji 🚀 test",
    "don’t (curly apostrophe)",
    "½ + ¼ = ¾",
    # vocab-boundary stress
    "antidisestablishmentarianism",
    "supercalifragilisticexpialidocious",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "zqxjkvbw qzjxkv",
    # text that looks like special tokens (must NOT map to special ids)
    "<|endoftext|>",
    "[_BEG_]",
    # mixed everything
    " And so, my fellow Americans: ask not what your country can do for"
    " you — ask what you can do for your country.",
]

MODELS = {
    "tiny.en": "for-tests-ggml-tiny.en.bin",
    "tiny": "for-tests-ggml-tiny.bin",   # multilingual: shifted special ids
}


def main():
    refbuild = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild")
    exe = pathlib.Path("/tmp/ref_tokenize")
    subprocess.run(
        ["g++", "-O1", str(ROOT / "tools" / "ref_tokenize.c"),
         f"-I{REF}/include", f"-I{REF}/ggml/include",
         str(refbuild / "src" / "libwhisper.so"),
         f"-Wl,-rpath,{refbuild}/src:{refbuild}/ggml/src",
         "-o", str(exe)],
        check=True)

    corpus_file = pathlib.Path("/tmp/tokenizer_corpus.nul")
    corpus_file.write_bytes(b"\x00".join(s.encode("utf-8") for s in CORPUS)
                            + b"\x00")

    out = {"corpus": CORPUS, "models": {}}
    for name, fname in MODELS.items():
        res = subprocess.run(
            [str(exe), str(REF / "models" / fname), str(corpus_file)],
            check=True, capture_output=True, text=True)
        ids = [json.loads(line) for line in res.stdout.splitlines()]
        assert len(ids) == len(CORPUS), (name, len(ids))
        out["models"][name] = ids
        print(f"{name}: {sum(len(x) for x in ids)} tokens over "
              f"{len(CORPUS)} strings")

    with open(GOLDEN / "ref_tokenizer.json", "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"-> {GOLDEN / 'ref_tokenizer.json'}")


if __name__ == "__main__":
    main()

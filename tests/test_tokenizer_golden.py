"""Byte-exact tokenizer goldens vs the reference binary.

tests/golden/ref_tokenizer.json holds `whisper_tokenize` output captured
from the reference libwhisper.so (src/whisper.cpp:3283-3331) on the stub
models (REAL vocab) over an adversarial corpus — unicode, contractions,
digits, mixed scripts, whitespace shapes.  Regenerate with
tools/capture_tokenizer_goldens.py.
"""

import json
import os

import pytest

from whisper_tpu.tokenizer import detokenize, tokenize
from whisper_tpu.weights.ggml_reader import read_ggml_file

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_tokenizer.json")
REF_MODELS = "/root/reference/models"


def _load():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("model", ["tiny.en", "tiny"])
def test_tokenize_matches_reference_binary(model):
    data = _load()
    vocab = read_ggml_file(
        f"{REF_MODELS}/for-tests-ggml-{model}.bin").vocab
    mismatches = []
    for text, ref_ids in zip(data["corpus"], data["models"][model]):
        got = tokenize(vocab, text)
        if got != ref_ids:
            mismatches.append((text, ref_ids, got))
    assert not mismatches, "\n".join(
        f"{t!r}: ref={r} got={g}" for t, r, g in mismatches[:10])


def test_tokenize_roundtrip_text():
    """Detokenizing the golden ids reproduces the input bytes for pure
    in-vocab text (tokenization is lossless there)."""
    vocab = read_ggml_file(
        f"{REF_MODELS}/for-tests-ggml-tiny.en.bin").vocab
    for text in ("Hello world", "don't", "3.14159", "café"):
        ids = tokenize(vocab, text)
        assert detokenize(vocab, ids) == text


def test_tokenize_never_emits_special_ids():
    """Text that LOOKS like special-token markup must stay plain text
    (special ids are not reachable through byte matching — the reference
    vocab maps them outside token_to_id for synthesized names)."""
    vocab = read_ggml_file(
        f"{REF_MODELS}/for-tests-ggml-tiny.bin").vocab
    for text in ("<|endoftext|>", "[_BEG_]", "[_SOT_]"):
        for tid in tokenize(vocab, text):
            assert tid < vocab.token_eot, (text, tid)

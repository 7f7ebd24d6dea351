"""GBNF grammar engine tests (parser + pushdown automaton)."""

import numpy as np
import pytest

from whisper_tpu.grammar import (
    PartialUtf8, decode_utf8, grammar_from_gbnf, parse_gbnf)
from whisper_tpu.weights.ggml_reader import read_ggml_file


@pytest.fixture(scope="module")
def vocab():
    return read_ggml_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin").vocab


def test_decode_utf8_simple():
    cps, partial = decode_utf8(b"ab", PartialUtf8())
    assert cps == [97, 98, 0]
    assert partial.n_remain == 0


def test_decode_utf8_partial():
    full = "é".encode("utf-8")          # 2 bytes
    cps1, partial = decode_utf8(full[:1], PartialUtf8())
    assert partial.n_remain == 1
    cps2, partial2 = decode_utf8(full[1:], partial)
    assert cps2[0] == ord("é")
    assert partial2.n_remain == 0


def test_parse_colors_gbnf():
    src = open("/root/reference/grammars/colors.gbnf").read()
    rules, symbols = parse_gbnf(src)
    assert "root" in symbols
    assert len(rules) >= 2


def test_colors_constrains_first_token(vocab):
    g = grammar_from_gbnf(open("/root/reference/grammars/colors.gbnf").read())
    logits = np.zeros(vocab.n_vocab, dtype=np.float32)
    g.suppress_invalid(vocab, logits, 100.0)
    # init ::= " red, green, blue" — only that prefix is admissible
    assert logits[vocab.token_to_id[b" red"]] == 0.0
    assert logits[vocab.token_to_id[b" re"]] == 0.0
    assert logits[vocab.token_to_id[b" green"]] == -100.0
    assert logits[vocab.token_to_id[b" banana"]] == -100.0
    assert logits[vocab.token_to_id[b"x"]] == -100.0


def test_accept_token_advances(vocab):
    g = grammar_from_gbnf(open("/root/reference/grammars/colors.gbnf").read())
    g.accept_token(vocab, vocab.token_to_id[b" red"])
    logits = np.zeros(vocab.n_vocab, dtype=np.float32)
    g.suppress_invalid(vocab, logits, 100.0)
    assert logits[vocab.token_to_id[b","]] == 0.0       # "," allowed after
    assert logits[vocab.token_to_id[b" red"]] == -100.0  # no second color


def test_chess_gbnf_parses():
    g = grammar_from_gbnf(open("/root/reference/grammars/chess.gbnf").read())
    assert g.stacks


def test_parse_no_trailing_newline():
    """Input ending mid-rule without a newline must parse, not hang:
    _peek() returns "" at EOF and '"" in " \\t"' is True (empty substring),
    which spun _ws_inline forever (regression, round 3)."""
    from whisper_tpu.grammar import parse_gbnf
    rules, syms = parse_gbnf("root ::= [a-z ]*")
    assert "root" in syms
    rules2, _ = parse_gbnf('root ::= "abc"')
    assert len(rules2) >= 1


def test_repetition_operators():
    g = grammar_from_gbnf('root ::= "a"+ "b"?\n')
    import numpy as np
    # accept 'a' twice then 'b'
    class V:  # minimal vocab stub
        token_eot = 3
        id_to_token = [b"a", b"b", b"c", b"<eot>"]
        token_to_id = {b"a": 0, b"b": 1, b"c": 2}
    v = V()
    logits = np.zeros(4, np.float32)
    g.suppress_invalid(v, logits, 100.0)
    assert logits[0] == 0 and logits[1] == -100 and logits[2] == -100
    g.accept_token(v, 0)
    logits = np.zeros(4, np.float32)
    g.suppress_invalid(v, logits, 100.0)
    assert logits[0] == 0 and logits[1] == 0 and logits[2] == -100


def test_native_engine_matches_python(vocab):
    """C++ engine vs the Python engine: identical suppression masks and
    state evolution across a multi-token walk."""
    from whisper_tpu.grammar import NativeGrammar, _load_native, parse_gbnf

    if _load_native() is None:
        pytest.skip("native grammar library not built")

    src = open("/root/reference/grammars/chess.gbnf").read()
    rules, symbols = parse_gbnf(src)
    from whisper_tpu.grammar import Grammar
    g_py = Grammar(rules, symbols["root"])
    g_nat = NativeGrammar(rules, symbols["root"])

    for step in range(4):
        lp = np.zeros(vocab.n_vocab, np.float32)
        ln = np.zeros(vocab.n_vocab, np.float32)
        g_py.suppress_invalid(vocab, lp, 100.0)
        g_nat.suppress_invalid(vocab, ln, 100.0)
        np.testing.assert_array_equal(lp, ln)
        allowed = np.where(lp == 0)[0]
        allowed = [t for t in allowed if t < vocab.token_eot
                   and vocab.id_to_token[int(t)]]
        if not allowed:
            break
        tid = int(allowed[min(step, len(allowed) - 1)])
        g_py.accept_token(vocab, tid)
        g_nat.accept_token(vocab, tid)

    # clone preserves state
    c = g_nat.copy()
    l1 = np.zeros(vocab.n_vocab, np.float32)
    l2 = np.zeros(vocab.n_vocab, np.float32)
    g_nat.suppress_invalid(vocab, l1, 100.0)
    c.suppress_invalid(vocab, l2, 100.0)
    np.testing.assert_array_equal(l1, l2)

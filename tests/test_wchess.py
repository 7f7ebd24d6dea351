"""Chessboard engine tests — the reference's test-chessboard.cpp game
scripts ported verbatim (examples/wchess/libwchess/test-chessboard.cpp),
plus grammar-shape checks against Chessboard.cpp:546-607."""

from whisper_tpu.chessboard import Chessboard


def play(board, *moves_and_results):
    for cmd, want in moves_and_results:
        got = board.process(cmd)
        assert got == want, f"{cmd!r}: got {got!r}, want {want!r}"


def test_game_1():
    chess = Chessboard()
    play(chess,
         ("pawn to d4", "d2-d4"),
         ("e5", "e7-e5"),
         ("c1 h6", "c1-h6"),
         ("queen h4", "d8-h4"),
         ("bishop to g5", "h6-g5"),
         ("bishop to b4", "f8-b4"),
         ("c4", ""),                   # pinned pawn may not advance
         ("knight c3", "b1-c3"),
         ("knight c6", "b8-c6"),
         ("f3", ""))


def test_game_2():
    chess = Chessboard()
    play(chess,
         ("d4", "d2-d4"), ("e5", "e7-e5"), ("e4", "e2-e4"),
         ("queen h4", "d8-h4"), ("queen h5", "d1-h5"), ("f5", ""),
         ("g6", "g7-g6"), ("knight e2", "g1-e2"), ("f5", "f7-f5"),
         ("knight g3", "e2-g3"), ("g5", ""), ("king e7", "e8-e7"),
         ("f4", "f2-f4"), ("g5", "g6-g5"))


def test_game_3():
    chess = Chessboard()
    play(chess,
         ("e4", "e2-e4"), ("c5", "c7-c5"), ("e5", "e4-e5"),
         ("c4", "c5-c4"), ("e6", "e5-e6"), ("c3", "c4-c3"),
         ("e7", ""), ("f7", "e6-f7"), ("d2", ""),
         ("king to f7", "e8-f7"), ("f4", "f2-f4"), ("d2", "c3-d2"),
         ("f5", ""), ("king to e2", "e1-e2"), ("king to g6", "f7-g6"),
         ("f5", "f4-f5"), ("e6", ""), ("king to h5", "g6-h5"),
         ("g4", "g2-g4"), ("king to g5", "h5-g5"), ("h4", "h2-h4"),
         ("king to h5", ""), ("king to g6", ""), ("king to h6", "g5-h6"),
         ("bishop to d2", "c1-d2"), ("king to g5", ""), ("g5", "g7-g5"))


def test_fools_mate_ends_game():
    chess = Chessboard()
    play(chess,
         ("f4", "f2-f4"), ("e5", "e7-e5"), ("g4", "g2-g4"),
         ("queen to h4", "d8-h4#"),     # checkmate marker
         ("knight f3", ""))             # no move after mate
    assert chess.grammar() == ""


def test_check_not_mate_keeps_grammar():
    chess = Chessboard()
    play(chess,
         ("f4", "f2-f4"), ("e5", "e7-e5"), ("g4", "g2-g4"),
         ("d5", "d7-d5"), ("g1 f3", "g1-f3"),
         ("queen to h4", "d8-h4"))
    assert chess.grammar() != ""


def test_knight_game():
    chess = Chessboard()
    play(chess,
         ("knight c3", "b1-c3"), ("knight c6", "b8-c6"),
         ("knight b5", "c3-b5"), ("knight f6", "g8-f6"),
         ("knight d6", "b5-d6"), ("knight d4", ""),
         ("d6", "c7-d6"), ("e4", "e2-e4"),
         ("knight d4", "c6-d4"), ("d3", "d2-d3"),
         ("knight e4", "f6-e4"),
         ("king to e2", ""), ("king to d2", ""))


def test_initial_grammar_shape():
    """Opening grammar admits exactly the 20 legal first moves."""
    chess = Chessboard()
    g = chess.grammar()
    assert g.startswith(
        'move ::= " " ((piece | frompos) " " "to "?)? topos\n')
    assert '"pawn"' in g and '"knight"' in g
    assert '"bishop"' not in g and '"queen"' not in g and '"king"' not in g
    # topos: 16 rank-3/4 pawn targets (knight jumps land inside them)
    topos = [ln for ln in g.splitlines() if ln.startswith("topos")][0]
    assert topos.count('"') == 2 * 16
    frompos = [ln for ln in g.splitlines() if ln.startswith("frompos")][0]
    assert frompos.count('"') == 2 * 10   # 8 pawns + 2 knights


def test_prompt_grammar():
    chess = Chessboard()
    chess.set_prompt("rook to d4, f3")
    g = chess.grammar()
    assert g.startswith('move ::= prompt " " frompos " " "to "? topos\n'
                        'prompt ::= " rook to d4, f3"\n')


def test_grammar_parses_with_engine():
    """The generated GBNF loads in our grammar engine at every ply."""
    from whisper_tpu.grammar import grammar_from_gbnf

    chess = Chessboard()
    for cmd in ("e4", "e5", "knight f3", "knight c6", "bishop to c4"):
        rules = grammar_from_gbnf(chess.grammar(), "move")
        assert rules is not None
        assert chess.process(cmd) != ""
    assert grammar_from_gbnf(chess.grammar(), "move") is not None


def test_king_capture_does_not_crash():
    """The reference's lazy allowed-set update lets a stale king move slip
    through (e2 still listed after Ba6 pins nothing but attacks e2); after
    the king is captured, process() must keep returning results instead of
    raising (reference reads board[INVALID_POS] without crashing)."""
    chess = Chessboard()
    play(chess,
         ("e4", "e2-e4"), ("b6", "b7-b6"), ("a4", "a2-a4"),
         ("bishop to a6", "c8-a6"),
         ("king to e2", "e1-e2"),       # stale allowed set accepts this
         ("bishop to e2", "a6-e2"))     # captures the king
    # further processing must not raise
    for cmd in ("d4", "d5", "queen to e2", "knight f3"):
        assert isinstance(chess.process(cmd), str)
    assert isinstance(chess.grammar(), str)


def test_stringify_board():
    chess = Chessboard()
    s = chess.stringify_board()
    lines = s.splitlines()
    assert lines[0] == "a b c d e f g h"
    assert lines[1] == "r n b q k b n r 8"
    assert lines[2] == "p p p p p p p p 7"
    assert lines[7] == "P P P P P P P P 2"
    assert lines[8] == "R N B Q K B N R 1"
    chess.process("e4")
    assert "P" in chess.stringify_board().splitlines()[5]   # pawn on e4

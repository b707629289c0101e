"""Chess960 perft cross-validation against the reference engine.

No published perft tables cover arbitrary Chess960 start numbers, so the
oracle is the reference's own movegen (ChessState/ChessRules,
src/games/chess/chess_state.cpp, chess_rules.cpp), compiled by
tools/parity/build_chess.sh.  Two independently-written legal-move
generators agreeing on exact node counts over randomly-chosen 960 starts —
plus castling-ready sparse positions where KxR castling is available at
move 1 — is strong evidence for both.

Notes on the oracle (see build_chess.sh for the mechanical fixes):
* the reference's numeric position decode (Chess960::getPermutation,
  src/games/chess/chess960.cpp:442) is broken as checked in (knight-config
  decode leaves squares unset), so position numbers are decoded on OUR side
  (games/chess.chess960_back_rank, Scharnagl) and shipped to the oracle as
  start FENs; the oracle derives original rook files from the back rank.
* the reference's makeMove self-recurses to stack overflow as checked in;
  the build script restores the intended pseudo-legal bypass.
"""
import functools
import os
import shutil
import subprocess
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.chess import (
    KING,
    ROOK,
    ChessEnv,
    chess960_back_rank,
)
from alphazero_tpu.games.chess_fen import fen_from_state, state_from_fen

from test_chess import perft  # vectorized perft driver

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = "/tmp/chess_perft_build/chess_perft"

# Spread over the Scharnagl space; 518 is classical chess (sanity anchor).
SWEEP = [0, 1, 77, 100, 250, 333, 480, 518, 700, 959]


@functools.lru_cache(maxsize=1)
def oracle_path():
    if shutil.which("g++") is None or not os.path.isdir("/root/reference"):
        return None
    if not os.path.exists(ORACLE):
        r = subprocess.run(
            ["bash", os.path.join(REPO, "tools/parity/build_chess.sh")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            return None
    return ORACLE if os.path.exists(ORACLE) else None


def oracle_perft_960(fen: str, depth: int) -> list:
    out = subprocess.run(
        [oracle_path(), "--depth", str(depth), "--960fen", fen],
        capture_output=True, text=True, check=True, timeout=600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["perft"]


needs_oracle = pytest.mark.skipif(
    oracle_path() is None,
    reason="reference chess oracle unavailable (no g++ or /root/reference)",
)


def castling_ready_fen(number: int) -> tuple:
    """Start FEN for position ``number`` with every back-rank piece except
    the king and rooks removed — KxR castling both ways is available at
    move 1 for both sides (unless the king path is attacked, which it never
    is with only pawns opposing)."""
    rank = chess960_back_rank(number)
    chars = []
    for p in rank:
        chars.append({KING: "k", ROOK: "r"}.get(p, "."))
    run, row = 0, ""
    for c in chars:
        if c == ".":
            run += 1
        else:
            row += (str(run) if run else "") + c
            run = 0
    row += str(run) if run else ""
    fen = f"{row}/pppppppp/8/8/8/8/PPPPPPPP/{row.upper()} w KQkq - 0 1"
    king_file = rank.index(KING)
    qs = max(i for i in range(king_file) if rank[i] == ROOK)
    ks = min(i for i in range(king_file + 1, 8) if rank[i] == ROOK)
    return fen, king_file, ks, qs


@needs_oracle
class TestChess960StartPerft:
    @pytest.mark.parametrize("number", SWEEP)
    def test_start_d2(self, number):
        env = ChessEnv(chess960_position=number)
        fen = fen_from_state(env.init())
        ref = oracle_perft_960(fen, 2)
        mine = [perft(env, env.init(), d) for d in (1, 2)]
        assert mine == ref, (number, fen, mine, ref)

    @pytest.mark.parametrize("number", [0, 333, 959])
    def test_start_d3(self, number):
        env = ChessEnv(chess960_position=number)
        fen = fen_from_state(env.init())
        ref = oracle_perft_960(fen, 3)
        mine = [perft(env, env.init(), d) for d in (1, 2, 3)]
        assert mine == ref, (number, fen, mine, ref)


@needs_oracle
class TestChess960CastlingPerft:
    """Sparse back ranks: castling is legal at move 1, so d2 counts cover
    the KxR castling encoding, path-clearance and rights bookkeeping."""

    @pytest.mark.parametrize("number", SWEEP)
    def test_castling_ready_d2(self, number):
        fen, king_file, ks, qs = castling_ready_fen(number)
        env = ChessEnv()
        st = state_from_fen(env, fen)
        st = st.replace(
            rook_start=jnp.asarray([[ks, qs], [ks, qs]], jnp.int32),
            king_start=jnp.asarray([king_file, king_file], jnp.int32),
        )
        # state.legal is a cache computed at construction — refresh it for
        # the overridden castling geometry.
        legal, in_check = env._legal_mask_impl(st)
        st = st.replace(legal=legal, in_check=in_check)
        # The reference's (from,to) move encoding cannot distinguish a
        # normal one-step king move onto file c/g from a castle landing
        # there (no castle flag in ChessMove) — for king start files b/d/f
        # those collide, its makeMove must guess, and deeper counts are
        # not comparable.  Depth 1 still covers move COUNTS (the castle and
        # the step are two generated moves in both engines).
        depth = 1 if king_file in (1, 3, 5) else 2
        ref = oracle_perft_960(fen, depth)
        mine = [perft(env, st, d) for d in range(1, depth + 1)]
        assert mine == ref, (number, fen, mine, ref)

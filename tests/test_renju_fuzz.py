"""Renju forbidden-move fuzz vs the reference-semantics oracle
(tests/renju_oracle.py — a faithful NumPy port of
gomoku_rules.cpp:118-1224).  tools/fuzz_renju.py runs the large sweeps;
this CI slice asserts every divergence falls in the DOCUMENTED classes
(PARITY.md "Renju semantics"), all of which are reference bugs or the
deliberate five-precedence rule:

  five-precedence   ours applies Renju rule: an exact five is never
                    forbidden; the reference never checks fives.
  d4-global         the reference's renju_count_all_fours is board-global:
                    two unrelated "fours" anywhere forbid EVERY empty cell.
  d4-through        the reference's 6/7-window four shapes count gapped
                    stones and overline-completions as fours.
  double-three      the reference's 9.3 straight-four-capability machinery
                    (anchor = *pattern.begin(), patterns = whole windows)
                    under-detects; ours forbids per the standard rule.

The fuzz FOUND two real bugs in our implementation (fixed in round 2):
edge-truncated 5-windows counted as fours, and fours whose only five
completion makes an overline (six)."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from alphazero_tpu.games.gomoku import GomokuEnv  # noqa: E402

ALLOWED_CLASSES = {
    ("d4-global", "ref-forbids"),
    ("d4-through", "ref-forbids"),
    ("double-three", "ours-forbids"),
}


class TestRenjuFuzz:
    def test_fuzz_divergences_only_in_documented_classes(self):
        from fuzz_renju import compare_board, random_board

        env = GomokuEnv(board_size=9, use_renju=True)
        fmap = jax.jit(env.forbidden_map)
        rng = np.random.default_rng(123)
        total = n_other = 0
        for _ in range(20):
            board = random_board(rng, 9, 40)
            n, _fives, others = compare_board(env, fmap, board)
            total += n
            n_other += len(others)
            for x, y, ref, ours_f, stage in others:
                key = (stage, "ref-forbids" if ref else "ours-forbids")
                assert key in ALLOWED_CLASSES, (
                    f"undocumented divergence {key} at ({x},{y})\n{board}"
                )
        # Divergence rate stays bounded (all classes are reference bugs).
        assert n_other / max(total, 1) < 0.08


class TestFuzzFoundBugs:
    """Regression positions for the two real bugs the fuzz surfaced."""

    def _maps(self, board):
        import jax.numpy as jnp

        env = GomokuEnv(board_size=9, use_renju=True)
        black = jnp.asarray(board == 1)
        white = jnp.asarray(board == 2)
        empty = ~(black | white)
        return env, env._four_counts(black, white, empty)

    def test_edge_truncated_window_is_not_a_four(self):
        # Diagonal blacks at (4,5),(5,6),(6,7), white at (3,4); candidate
        # (7,8): the only all-empty-completion "window" (4,5)..(8,9) hangs
        # off the board — filling it can never make five.
        board = np.zeros((9, 9), np.int8)
        for x, y in ((4, 5), (5, 6), (6, 7)):
            board[x, y] = 1
        board[3, 4] = 2
        env, fours = self._maps(board)
        assert sum(int(c[7, 8]) for c in fours) == 0

    def test_overline_completion_is_not_a_four(self):
        # Col 8: blacks at rows 1,3,4,6, white at 0 and 8; candidate (2,8).
        # Every five-completion through the column makes a six (overline).
        board = np.zeros((9, 9), np.int8)
        board[0, 8] = 2
        for r in (1, 3, 4, 6):
            board[r, 8] = 1
        board[8, 8] = 2
        env, fours = self._maps(board)
        assert sum(int(c[2, 8]) for c in fours) == 0

    def test_real_four_still_counts(self):
        # Row 4: blacks at cols 2,3,4; candidate (4,5): filling (4,6) or
        # placing at 5 then 1/6 completes an exact five — a genuine four.
        board = np.zeros((9, 9), np.int8)
        for c in (2, 3, 4):
            board[4, c] = 1
        env, fours = self._maps(board)
        assert sum(int(c[4, 5]) for c in fours) >= 1

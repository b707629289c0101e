"""Text board renderers.

The reference text-UI layer (``include/alphazero/ui/renderer.h:18,136``,
``src/ui/*`` — ASCII/Unicode TextRenderer + GameUI) reduced to pure
functions: state -> string, for the CLI/REST surfaces.
"""
from __future__ import annotations

import numpy as np

_GOMOKU_STONES = {-1: ".", 0: "X", 1: "O"}
_GO_STONES = {-1: ".", 0: "#", 1: "O"}
_CHESS_PIECES = "PNBRQK"


def render_board_game(board, stones, last_move=None) -> str:
    """Render an int8 [N, N] stone board with column letters / row numbers
    (gomoku & go)."""
    board = np.asarray(board)
    n = board.shape[0]
    cols = "".join(chr(ord("A") + i) for i in range(n))
    lines = ["   " + " ".join(cols)]
    for r in range(n - 1, -1, -1):
        cells = []
        for c in range(n):
            ch = stones[int(board[r, c])]
            if last_move is not None and last_move == r * n + c:
                ch = f"({ch})" if False else ch
            cells.append(ch)
        lines.append(f"{r + 1:2d} " + " ".join(cells))
    return "\n".join(lines)


def render_gomoku(state) -> str:
    return render_board_game(state.board, _GOMOKU_STONES)


def render_go(state) -> str:
    board = render_board_game(state.board, _GO_STONES)
    extra = (
        f"\npasses: {int(state.consecutive_passes)}  "
        f"prisoners B/W: {int(state.prisoners[0])}/{int(state.prisoners[1])}"
    )
    return board + extra


def render_chess(state) -> str:
    board = np.asarray(state.board)
    lines = ["   a b c d e f g h"]
    for r in range(7, -1, -1):
        cells = []
        for c in range(8):
            p = int(board[r, c])
            if p < 0:
                cells.append(".")
            else:
                ch = _CHESS_PIECES[p % 6]
                cells.append(ch if p < 6 else ch.lower())
        lines.append(f" {r + 1} " + " ".join(cells))
    lines.append("   a b c d e f g h")
    return "\n".join(lines)


def render(env, state) -> str:
    from alphazero_tpu.core.types import GameType

    if env.game_type == GameType.CHESS:
        return render_chess(state)
    if env.game_type == GameType.GO:
        return render_go(state)
    return render_gomoku(state)

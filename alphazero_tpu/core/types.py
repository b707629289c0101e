"""Core types shared across the framework.

TPU-native re-expression of the reference's core abstractions
(``include/alphazero/core/igamestate.h:17-31`` GameType/GameResult enums and
the 20-method ``IGameState`` contract, ``igamestate.h:60-223``).  Instead of a
virtual interface over a mutable object, each game is a module of pure,
``vmap``-able functions over an immutable struct-of-arrays state pytree — the
shape that lets XLA step thousands of boards in lockstep on the MXU/VPU.
"""
from __future__ import annotations

import enum
from typing import Any, NamedTuple, Protocol, Tuple

import jax
import jax.numpy as jnp


class GameType(enum.IntEnum):
    """Mirrors the reference enum (igamestate.h:17-23)."""

    UNKNOWN = 0
    GOMOKU = 1
    CHESS = 2
    GO = 3


class GameResult(enum.IntEnum):
    """Mirrors the reference enum (igamestate.h:25-31)."""

    ONGOING = 0
    DRAW = 1
    WIN_PLAYER1 = 2
    WIN_PLAYER2 = 3


# Player encoding used in array states: 0 = player 1 (black/white-in-chess
# sense: the side that moves first), 1 = player 2.  The reference uses 1/2
# (igamestate.h); helpers below convert.
PLAYER1 = 0
PLAYER2 = 1


def to_reference_player(p: jax.Array) -> jax.Array:
    """0/1 array player index -> reference 1/2 convention."""
    return p + 1


class StepResult(NamedTuple):
    state: Any
    # Reward from the perspective of the player who just moved: +1 win, -1
    # loss, 0 draw/ongoing.
    reward: jax.Array


class Env(Protocol):
    """The per-game module contract (duck-typed; see games/gomoku.py).

    Every function is pure and unbatched; callers ``jax.vmap`` them over a
    leading game-batch axis.  All shapes are static.  ``step`` on a terminal
    state must be a no-op returning the same state (the batched MCTS relies on
    this to keep all lanes in lockstep).
    """

    game_type: GameType
    num_actions: int
    observation_shape: Tuple[int, int, int]  # (C, H, W) enhanced planes

    def init(self, key: jax.Array) -> Any: ...

    def step(self, state: Any, action: jax.Array) -> Any: ...

    def legal_mask(self, state: Any) -> jax.Array: ...

    def observation(self, state: Any) -> jax.Array: ...

    def terminal(self, state: Any) -> jax.Array: ...

    def result(self, state: Any) -> jax.Array: ...

    def to_play(self, state: Any) -> jax.Array: ...


def result_from_winner(winner: jax.Array, terminal: jax.Array) -> jax.Array:
    """Map (winner in {-1 none, 0 p1, 1 p2}, terminal) to GameResult codes."""
    return jnp.where(
        ~terminal,
        GameResult.ONGOING,
        jnp.where(
            winner == PLAYER1,
            GameResult.WIN_PLAYER1,
            jnp.where(winner == PLAYER2, GameResult.WIN_PLAYER2, GameResult.DRAW),
        ),
    ).astype(jnp.int32)


def terminal_value(winner: jax.Array, to_play: jax.Array) -> jax.Array:
    """Value of a terminal position from the perspective of ``to_play``.

    winner: -1 = draw/none, 0 = player1, 1 = player2.
    """
    return jnp.where(
        winner < 0, 0.0, jnp.where(winner == to_play, 1.0, -1.0)
    ).astype(jnp.float32)

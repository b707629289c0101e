"""Arena: batched model-vs-model evaluation.

TPU-native counterpart of the reference evaluation drivers
(``python/scripts/evaluate.py`` — model-A vs model-B matches with color
swap; ``python/scripts/tournament.py`` round-robin).  Where the reference
alternates two ``ParallelMCTS`` instances per game thread, here both sides
play inside ONE batched search: the evaluator routes every leaf position to
the parameter set of the side to move, and the color assignment is a batch
axis (first half A=black, second half A=white — built-in color swap).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alphazero_tpu.mcts.search import EvalFn, MCTSConfig, search, select_action


def make_matchup_eval_fn(eval_a: EvalFn, eval_b: EvalFn,
                         a_is_black: jax.Array) -> EvalFn:
    """Route each lane's evaluation to A or B depending on which side is to
    move at the LEAF.  ``a_is_black``: bool [B].  Computes both models on
    every leaf (2x NN cost) — kept for arbitrary lane layouts; the arena
    fast path is ``make_mover_eval_fn``."""

    def eval_fn(obs, to_play):
        la, va = eval_a(obs, to_play)
        lb, vb = eval_b(obs, to_play)
        use_a = a_is_black == (to_play == 0)
        logits = jnp.where(use_a[:, None], la, lb)
        value = jnp.where(use_a, va, vb)
        return logits, value

    return eval_fn


def make_mover_eval_fn(eval_a: EvalFn, eval_b: EvalFn, half: int,
                       black_to_move: jax.Array) -> EvalFn:
    """Reference-semantics arena evaluator at 1x NN cost.

    The reference alternates two ``ParallelMCTS`` instances: the engine of
    the player to move at the ROOT evaluates every leaf of its search
    (python/scripts/evaluate.py match loop), rather than routing each leaf
    position to its own side's net.  With the color-swap batch layout
    (lanes [0, half) have A as black, the rest A as white) and strictly
    alternating games, the routing is static per move: when black is to
    move the first half searches with A and the second half with B, and
    vice versa.  Each half runs ONE network under ``lax.cond`` — half the
    forwards of the per-leaf ``make_matchup_eval_fn``."""

    def as_f32(e):
        # cond branches must agree on output dtypes; evaluators may differ
        # (e.g. a bf16 stub vs an int8-trunk model with f32 logits).
        def f(o, t):
            logits, value = e(o, t)
            return logits.astype(jnp.float32), value.astype(jnp.float32)

        return f

    fa, fb = as_f32(eval_a), as_f32(eval_b)

    def eval_fn(obs, to_play):
        o1, o2 = obs[:half], obs[half:]
        t1, t2 = to_play[:half], to_play[half:]
        l1, v1 = jax.lax.cond(black_to_move, fa, fb, o1, t1)
        l2, v2 = jax.lax.cond(black_to_move, fb, fa, o2, t2)
        return (jnp.concatenate([l1, l2]), jnp.concatenate([v1, v2]))

    return eval_fn


@dataclasses.dataclass(frozen=True)
class ArenaConfig:
    mcts: MCTSConfig = MCTSConfig(
        num_simulations=200, dirichlet_epsilon=0.0
    )
    max_moves: int = 226
    temperature: float = 0.1  # reference evaluate.py plays at T=0.1


class ArenaResult(NamedTuple):
    wins_a: jax.Array  # i32 scalar
    wins_b: jax.Array
    draws: jax.Array
    a_is_black: jax.Array  # bool [B]
    winner: jax.Array  # i32 [B]


def play_match(
    env,
    eval_a: EvalFn,
    eval_b: EvalFn,
    rng: jax.Array,
    config: ArenaConfig,
    num_games: int,
) -> ArenaResult:
    """Play ``num_games`` games (half with A as black).  Jittable."""
    B = num_games
    half = (B + 1) // 2
    a_is_black = jnp.arange(B) < half

    states = jax.vmap(lambda _: env.init())(jnp.arange(B))

    def body(carry, xs):
        st = carry
        step_rng, t = xs
        s_rng, a_rng = jax.random.split(step_rng)
        # Strict alternation: all live games share to_play = t % 2, so the
        # mover's model per half is static this move (see
        # make_mover_eval_fn).  Terminal lanes get arbitrary-but-ignored
        # evaluations, matching select_action's zero-visit fallback.
        eval_fn = make_mover_eval_fn(eval_a, eval_b, half, t % 2 == 0)
        out = search(env, eval_fn, st, s_rng, config.mcts)
        action = select_action(
            a_rng, out.visit_counts, jnp.float32(config.temperature)
        )
        return jax.vmap(env.step)(st, action), ()

    step_rngs = jax.random.split(rng, config.max_moves)
    states, _ = jax.lax.scan(
        body, states,
        (step_rngs, jnp.arange(config.max_moves, dtype=jnp.int32)),
    )

    winner = jax.vmap(env.winner)(states)  # -1 draw/unfinished, 0 black, 1 w
    a_won = (winner == 0) == a_is_black
    decided = winner >= 0
    wins_a = jnp.sum(decided & a_won).astype(jnp.int32)
    wins_b = jnp.sum(decided & ~a_won).astype(jnp.int32)
    draws = jnp.sum(~decided).astype(jnp.int32)
    return ArenaResult(wins_a, wins_b, draws, a_is_black, winner)

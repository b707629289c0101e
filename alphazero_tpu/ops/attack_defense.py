"""Batched Gomoku attack/defense move bonuses.

Parity target: the reference ``AttackDefenseModule``
(``include/alphazero/nn/attack_defense_module.h:9-65``,
``src/nn/attack_defense_module.cpp``): per-move bonuses from open-three /
four threat counts computed with 1-D window sums over stone masks.  The
reference keeps it standalone (not wired into any pipeline — SURVEY.md
§2.4); likewise this is an optional prior-shaping op, exposed for use as a
policy-logit bias.

Fully vectorized: for every cell at once, count the fours/open-threes a
stone of each color would create (reusing the gomoku window machinery),
then bonus = attack_weight * own_threats + defense_weight * opp_threats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from alphazero_tpu.games.gomoku import (
    _DIRS,
    _covers,
    _run_through_maps,
    _shift_plane,
    _window_sum,
)


def _threat_counts(stones: jax.Array, opponent: jax.Array):
    """(fours [N,N], open_threes [N,N]) created by placing a ``stones``-color
    stone at each empty cell."""
    empty = ~(stones | opponent)
    fours = jnp.zeros(stones.shape, jnp.int32)
    threes = jnp.zeros(stones.shape, jnp.int32)
    for dr, dc in _DIRS:
        b5 = _window_sum(stones, dr, dc, 5)
        w5 = _window_sum(opponent, dr, dc, 5)
        four_window = (b5 == 3) & (w5 == 0)
        f = jnp.zeros(stones.shape, jnp.int32)
        for i in range(5):
            f = f + _shift_plane(four_window.astype(jnp.int32),
                                 -i * dr, -i * dc)
        fours = fours + f

        mid4_b = _shift_plane(_window_sum(stones, dr, dc, 4), dr, dc)
        mid4_w = _shift_plane(_window_sum(opponent, dr, dc, 4), dr, dc)
        ends = empty & _shift_plane(empty, 5 * dr, 5 * dc)
        three_window = ends & (mid4_b == 2) & (mid4_w == 0)
        threes = threes + _covers(three_window, dr, dc,
                                  range(1, 5)).astype(jnp.int32)
    wins = jnp.any(_run_through_maps(stones) >= 5, axis=0)
    return (
        jnp.where(empty, fours, 0),
        jnp.where(empty, threes, 0),
        jnp.where(empty, wins, False),
    )


def compute_bonuses(
    board: jax.Array,  # int8 [N, N]: -1 empty, 0 black, 1 white
    to_play: jax.Array,  # i32 scalar
    attack_weight: float = 1.0,
    defense_weight: float = 0.7,
    win_bonus: float = 10.0,
    four_weight: float = 1.0,
    three_weight: float = 0.5,
) -> jax.Array:
    """f32 [N*N] per-move bonus for the side to move (higher = more urgent).
    vmap over a leading batch axis for the batched API the reference offers
    (``compute_bonuses`` over batches, attack_defense_module.h:9-65)."""
    me = board == to_play.astype(jnp.int8)
    opp = board == (1 - to_play).astype(jnp.int8)
    my4, my3, mywin = _threat_counts(me, opp)
    op4, op3, opwin = _threat_counts(opp, me)
    attack = (
        win_bonus * mywin.astype(jnp.float32)
        + four_weight * my4
        + three_weight * my3
    )
    defense = (
        win_bonus * opwin.astype(jnp.float32)
        + four_weight * op4
        + three_weight * op3
    )
    return (attack_weight * attack + defense_weight * defense).reshape(-1)


def policy_bias_eval_fn(base_eval_fn, board_size: int, scale: float = 0.5):
    """Wrap an evaluator to add attack/defense bonuses to the policy logits
    (an optional prior-shaping layer the reference never wired in)."""

    def eval_fn(obs, to_play):
        logits, value = base_eval_fn(obs, to_play)
        me = obs[:, 0] > 0.5
        op = obs[:, 1] > 0.5
        board = jnp.where(
            me,
            to_play[:, None, None].astype(jnp.int8),
            jnp.where(op, (1 - to_play)[:, None, None].astype(jnp.int8),
                      jnp.int8(-1)),
        )
        bonus = jax.vmap(compute_bonuses)(board, to_play)
        return logits + scale * bonus, value

    return eval_fn

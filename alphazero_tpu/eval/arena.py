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

from alphazero_tpu.mcts.search import (
    EvalFn,
    MCTSConfig,
    make_host_search,
    search,
    select_action,
)


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
    # Random opening plies before search begins, MIRRORED across the
    # color-swap pairing (both colors play each opening).  Without this,
    # deep searches are effectively deterministic at T=0.1 — measured at
    # 800 sims: 1-3 distinct actions across 32 lanes, so a "512-game"
    # match is one game replicated and the tally splits exactly by color
    # (BENCHLOG round 5).  Diverse mirrored openings are the standard
    # engine-testing remedy (openings book played from both sides).
    opening_random_moves: int = 0


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
    return _tally(winner, a_is_black)


def _tally(winner: jax.Array, a_is_black: jax.Array) -> ArenaResult:
    a_won = (winner == 0) == a_is_black
    decided = winner >= 0
    wins_a = jnp.sum(decided & a_won).astype(jnp.int32)
    wins_b = jnp.sum(decided & ~a_won).astype(jnp.int32)
    draws = jnp.sum(~decided).astype(jnp.int32)
    return ArenaResult(wins_a, wins_b, draws, a_is_black, winner)


def _opening_actions(env, states, key, count: int):
    """One uniform-random legal action per PAIR (first ``count`` lanes),
    broadcast so mirrored lanes replay the identical opening."""
    legal = jax.vmap(env.legal_mask)(states)[:count]
    logits = jnp.where(legal, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def play_match_host(
    env,
    eval_a: EvalFn,
    eval_b: EvalFn,
    rng: jax.Array,
    config: ArenaConfig,
    num_games: int,
) -> ArenaResult:
    """Host-driven ``play_match``: per-move jitted search (the
    ``make_host_search`` per-sim executables with donated arenas), move
    application and early exit driven from Python.

    This is the production-depth match loop (VERDICT r4 #2): the scanned
    ``play_match`` jit of max_moves x num_simulations crashes the TPU
    worker at 800 sims/move (one giant program; BENCHLOG round 4), while
    this loop compiles three small executables regardless of depth.  The
    reference evaluates models at full search strength
    (python/scripts/evaluate.py match loop) — this makes that operating
    point reachable.  Identical routing semantics to ``play_match``:
    strict alternation, color-swap halves, mover's net evaluates every
    leaf of its search; the mover flag rides as a jit ARGUMENT so both
    parities share one executable."""
    B = num_games
    half = (B + 1) // 2
    a_is_black = jnp.arange(B) < half

    def mover_eval(black_to_move, obs, to_play):
        return make_mover_eval_fn(eval_a, eval_b, half, black_to_move)(
            obs, to_play
        )

    search_fn = make_host_search(env, mover_eval, config.mcts,
                                 with_params=True)
    step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
    all_done = jax.jit(lambda s: jax.vmap(env.terminal_flag)(s).all())
    winner_of = jax.jit(lambda s: jax.vmap(env.winner)(s))

    states = jax.vmap(lambda _: env.init())(jnp.arange(B))

    k = config.opening_random_moves
    if k:
        # Lane i (A black) and lane half+i (A white) replay the SAME
        # random opening — every opening is contested from both colors.
        opening = jax.jit(
            lambda s, key: _opening_actions(env, s, key, half)
        )
        rng, o_rng = jax.random.split(rng)
        for t in range(k):
            acts_half = opening(states, jax.random.fold_in(o_rng, t))
            acts = jnp.concatenate([acts_half, acts_half[: B - half]])
            states = step(states, acts)

    for t in range(config.max_moves - k):
        rng, s_rng, a_rng = jax.random.split(rng, 3)
        out = search_fn(jnp.asarray((t + k) % 2 == 0), states, s_rng)
        action = select_action(
            a_rng, out.visit_counts, jnp.float32(config.temperature)
        )
        states = step(states, action.astype(jnp.int32))
        if (t + 1) % 16 == 0 and bool(all_done(states)):
            break
    return _tally(winner_of(states), a_is_black)


def play_match_sides(
    env,
    side_a,
    side_b,
    rng: jax.Array,
    num_games: int,
    max_moves: int = 226,
    temperature: float = 0.1,
    opening_random_moves: int = 0,
) -> ArenaResult:
    """Host-driven match where each side brings its OWN (eval_fn,
    MCTSConfig) — simulation counts, wave sizes and tree-reuse settings
    may differ per side (needed for the fixed anchor pool,
    eval/anchors.py, whose search depth is part of the anchor identity;
    reference analog: evaluate.py alternates two independently configured
    ``ParallelMCTS`` instances).

    Layout: the whole batch shares one color assignment per half-match
    (every lane's mover is the same side on a given ply), so each move
    runs exactly one side's search executable over all games; the color
    swap is the second half-match.  ``side_x``: an ``(eval_fn,
    MCTSConfig)`` pair, or any callable ``(states, rng) -> SearchOutput``
    (e.g. a ``HostReuseSearch``)."""
    from alphazero_tpu.mcts.search import HostReuseSearch

    def as_search(side):
        if isinstance(side, tuple):
            eval_fn, cfg = side
            if cfg.tree_reuse:
                return HostReuseSearch(env, eval_fn, cfg)
            return make_host_search(env, eval_fn, cfg)
        return side

    sa, sb = as_search(side_a), as_search(side_b)
    B = (num_games + 1) // 2
    step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
    all_done = jax.jit(lambda s: jax.vmap(env.terminal_flag)(s).all())
    winner_of = jax.jit(lambda s: jax.vmap(env.winner)(s))

    k = opening_random_moves
    opening = jax.jit(lambda s, key: _opening_actions(env, s, key, B))
    rng, o_rng = jax.random.split(rng)  # shared by both halves: mirrored

    winners = []
    for half_idx, a_is_black in enumerate((True, False)):
        half_rng = jax.random.fold_in(rng, half_idx)
        for side in (sa, sb):
            if hasattr(side, "reset"):
                side.reset()
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        for t in range(k):
            # Identical per-lane openings in both halves (o_rng is shared)
            # — each opening is contested from both colors.
            states = step(states, opening(states, jax.random.fold_in(o_rng, t)))
        for t in range(max_moves - k):
            half_rng, s_rng, a_rng, adv_rng = jax.random.split(half_rng, 4)
            mover_is_a = ((t + k) % 2 == 0) == a_is_black
            mover, other = (sa, sb) if mover_is_a else (sb, sa)
            out = mover(states, s_rng)
            action = select_action(
                a_rng, out.visit_counts, jnp.float32(temperature)
            )
            action = action.astype(jnp.int32)
            states = step(states, action)
            # Carry any reused tree through EVERY played action (reference
            # updateWithMove applies on own and opponent moves alike,
            # self_play_manager.cpp:205-211).
            for side in (mover, other):
                if hasattr(side, "advance"):
                    side.advance(None, action, states, adv_rng)
            if (t + 1) % 16 == 0 and bool(all_done(states)):
                break
        winners.append(winner_of(states))

    winner = jnp.concatenate(winners)
    a_is_black_arr = jnp.concatenate(
        [jnp.ones((B,), bool), jnp.zeros((B,), bool)]
    )
    return _tally(winner, a_is_black_arr)

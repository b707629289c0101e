"""Batched self-play actor: the fused env+search+net hot loop.

TPU-native replacement for the reference self-play stack —
``SelfPlayManager::generateGames``/``playSingleGame``
(``src/selfplay/self_play_manager.cpp:47-234``), the ``selfplay`` binary
(``src/selfplay/selfplay_main.cpp``), and the multi-process scale-out of
``python/scripts/orchestrate_selfplay.py:303-400``.

Where the reference runs one OS thread per game feeding a leaf-batching
queue, here B games are a batch axis of one jitted program: every move is a
full batched MCTS (see mcts/search.py) followed by one lockstep env step.
Game-level, search-level and leaf-batch parallelism all collapse into the
same array dimension (SURVEY.md §2.8).  Scale-out across chips/hosts is the
mesh data axis, not processes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from alphazero_tpu.mcts.search import EvalFn, MCTSConfig, search, select_action


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    """Reference analog: SelfPlayManager settings (self_play_manager.h) —
    temperature 1.0 until move ``temperature_drop_move`` then 0.0
    (self_play_manager.cpp:236-239)."""

    mcts: MCTSConfig = MCTSConfig()
    max_moves: int = 226  # >= board cells + 1 for gomoku 15x15
    temperature: float = 1.0
    final_temperature: float = 0.0
    temperature_drop_move: int = 30
    # Continuous self-play: a lane whose game ends is immediately reset to
    # a fresh game instead of idling until the whole batch finishes — the
    # lockstep analog of the reference's per-thread continuous generation
    # (SelfPlayManager threads start their next game as soon as one ends,
    # self_play_manager.cpp:74-89).  Measured: finished lanes idling in
    # lockstep are the entire opening-vs-midgame bench gap (815 vs 603
    # moves/s; the traced per-move device cost is IDENTICAL in both
    # regimes — BENCHLOG round 5).  Value targets for recycled batches
    # come from ``value_targets_recycled`` (per-segment winners recorded
    # in ``MoveRecord.ended_winner``).  Incompatible with tree_reuse.
    recycle: bool = False


class MoveRecord(NamedTuple):
    """Per-move data across the batch (the array analog of the reference
    ``MoveData``: action, full-action-space policy, root value —
    game_record.h:21-122; full-action-space pi deliberately fixes the
    reference's children-indexed policy quirk, SURVEY.md §2.5)."""

    action: jax.Array  # i32 [B]
    policy: jax.Array  # f32 [B, A] normalized visit distribution
    root_value: jax.Array  # f32 [B]
    to_play: jax.Array  # i32 [B] player who chose the move
    active: jax.Array  # bool [B] game was live when the move was made
    ended_winner: jax.Array  # i32 [B] winner if the game ENDED on this
    #   move (-1 draw, 0/1 win), else -2; with recycle the post-move
    #   terminal state is replaced by a fresh game, so this is the only
    #   record of the segment boundary
    states: Any  # pre-move env states (None unless record_states)


class SelfPlayOutput(NamedTuple):
    states: Any  # final env states (B-batched)
    actions: jax.Array  # i32 [T, B]
    policies: jax.Array  # f32 [T, B, A]
    root_values: jax.Array  # f32 [T, B]
    to_play: jax.Array  # i32 [T, B]
    active: jax.Array  # bool [T, B]
    ended_winner: jax.Array  # i32 [T, B] per-move segment-end winner (-2 none)
    winner: jax.Array  # i32 [B] -1 draw/unfinished, 0, 1
    length: jax.Array  # i32 [B] moves actually played
    move_states: Any  # pre-move env states [T, B, ...] (None unless recorded)


def _batched_init(env, batch_size: int):
    return jax.vmap(lambda _: env.init())(jnp.arange(batch_size))


def _step_and_record(env, states, action, policy, root_value, active,
                     config: SelfPlayConfig, record_states: bool):
    """Apply the chosen actions, detect segment ends, optionally recycle
    finished lanes into fresh games."""
    new_states = jax.vmap(env.step)(states, action)
    done = jax.vmap(env.terminal_flag)(new_states)
    ended = active & done
    ended_winner = jnp.where(
        ended, jax.vmap(env.winner)(new_states), jnp.int32(-2)
    ).astype(jnp.int32)
    record = MoveRecord(
        action=action,
        policy=policy,
        root_value=root_value,
        to_play=jax.vmap(env.to_play)(states),
        active=active,
        ended_winner=ended_winner,
        states=states if record_states else None,
    )
    if config.recycle:
        if config.mcts.tree_reuse:
            raise ValueError("recycle is incompatible with tree_reuse")
        B = action.shape[0]
        fresh = _batched_init(env, B)
        new_states = jax.tree_util.tree_map(
            lambda f, s: jnp.where(
                done.reshape((B,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh, new_states,
        )
    return new_states, record


def move_once(env, eval_fn: EvalFn, states, rng, config: SelfPlayConfig,
              record_states: bool = False):
    """One move for every live game: search -> temperature select -> step."""
    search_rng, act_rng = jax.random.split(rng)
    out = search(env, eval_fn, states, search_rng, config.mcts)
    move_count = states.move_count
    temp = jnp.where(
        move_count < config.temperature_drop_move,
        config.temperature,
        config.final_temperature,
    ).astype(jnp.float32)
    action = select_action(act_rng, out.visit_counts, temp)
    active = ~jax.vmap(env.terminal_flag)(states)
    return _step_and_record(env, states, action, out.action_weights,
                            out.root_value, active, config, record_states)


def play_games(
    env,
    eval_fn: EvalFn,
    rng: jax.Array,
    config: SelfPlayConfig,
    batch_size: int,
    initial_states=None,
    record_states: bool = False,
) -> SelfPlayOutput:
    """Play a batch of games to completion (or ``max_moves``).  Jittable;
    ``env``, ``config``, ``batch_size``, ``record_states`` are static."""
    states = (
        initial_states
        if initial_states is not None
        else _batched_init(env, batch_size)
    )

    def body(carry, step_rng):
        st, = carry
        st, rec = move_once(env, eval_fn, st, step_rng, config, record_states)
        return (st,), rec

    step_rngs = jax.random.split(rng, config.max_moves)
    (states,), recs = jax.lax.scan(body, (states,), step_rngs)

    winner = jax.vmap(env.winner)(states)
    length = jnp.sum(recs.active, axis=0).astype(jnp.int32)
    return SelfPlayOutput(
        states=states,
        actions=recs.action,
        policies=recs.policy,
        root_values=recs.root_value,
        to_play=recs.to_play,
        active=recs.active,
        ended_winner=recs.ended_winner,
        winner=winner,
        length=length,
        move_states=recs.states,
    )


def value_targets(output: SelfPlayOutput) -> jax.Array:
    """z targets [T, B]: final result from the perspective of the player to
    move at each recorded position (+1 they won, -1 lost, 0 draw) — the
    reference Dataset's value target (src/selfplay/dataset.cpp:86-97).
    One game per lane (no recycling); unfinished games get z=0."""
    winner = output.winner[None, :]  # [1, B]
    tp = output.to_play
    return jnp.where(
        winner < 0,
        0.0,
        jnp.where(winner == tp, 1.0, -1.0),
    ).astype(jnp.float32)


def value_targets_recycled(output: SelfPlayOutput):
    """(z [T, B], valid [T, B]) for recycled (continuous) self-play: each
    move's result is the winner of the SEGMENT it belongs to, found by
    propagating ``ended_winner`` backward in time; moves of segments that
    never finished within the window are masked out (the reference
    likewise trains only on completed game records, dataset.cpp:64-114)."""
    ew = output.ended_winner  # [T, B]
    B = ew.shape[1]

    def rev(carry, ew_t):
        w = jnp.where(ew_t != -2, ew_t, carry)
        return w, w

    _, w_seq = jax.lax.scan(rev, jnp.full((B,), -2, ew.dtype), ew,
                            reverse=True)
    z = jnp.where(
        w_seq < 0,
        0.0,
        jnp.where(w_seq == output.to_play, 1.0, -1.0),
    ).astype(jnp.float32)
    valid = output.active & (w_seq != -2)
    return z, valid


def make_host_actor(env, eval_fn: EvalFn, config: SelfPlayConfig,
                    batch_size: int, with_params: bool = False,
                    record_states: bool = False):
    """Host-driven self-play stepper: the per-simulation loop runs in Python
    with donated tree buffers (see mcts/search.make_host_search — ~3x faster
    than the scan-carried loop on v5e).  Returns (step, init_states) where
    ``step(states, rng)`` — or ``step(params, states, rng)`` when
    ``with_params`` (params as jit args so weight refreshes don't retrace) —
    yields ``(new_states, MoveRecord)``.

    With ``config.mcts.tree_reuse`` the search keeps each game's tree
    between moves and re-roots it on the played action (reference
    ``updateWithMove`` + every-2-moves re-noise,
    self_play_manager.cpp:205-211).  The returned ``step`` then carries
    per-batch search state: call ``step.reset()`` before feeding it root
    states unrelated to the previous move's games."""
    from alphazero_tpu.mcts.search import HostReuseSearch, make_host_search

    if config.mcts.tree_reuse:
        run_search = HostReuseSearch(env, eval_fn, config.mcts,
                                     with_params=with_params)
    else:
        run_search = make_host_search(env, eval_fn, config.mcts,
                                      with_params=with_params)

    @jax.jit
    def act_and_step(states, visit_counts, root_value, act_rng):
        temp = jnp.where(
            states.move_count < config.temperature_drop_move,
            config.temperature,
            config.final_temperature,
        ).astype(jnp.float32)
        action = select_action(act_rng, visit_counts, temp)
        active = ~jax.vmap(env.terminal_flag)(states)
        policy = visit_counts / jnp.maximum(
            visit_counts.sum(-1, keepdims=True), 1
        )
        return _step_and_record(env, states, action, policy, root_value,
                                active, config, record_states)

    reuse = config.mcts.tree_reuse

    if with_params:
        def step(params, states, rng):
            search_rng, act_rng = jax.random.split(rng)
            out = run_search(params, states, search_rng)
            new_states, record = act_and_step(
                states, out.visit_counts, out.root_value, act_rng
            )
            if reuse:
                run_search.notify_action(record.action)
            return new_states, record
    else:
        def step(states, rng):
            search_rng, act_rng = jax.random.split(rng)
            out = run_search(states, search_rng)
            new_states, record = act_and_step(
                states, out.visit_counts, out.root_value, act_rng
            )
            if reuse:
                run_search.notify_action(record.action)
            return new_states, record

    step.reset = run_search.reset if reuse else (lambda: None)
    step.search = run_search  # diagnostics (last_fresh_sims)
    return step, _batched_init(env, batch_size)

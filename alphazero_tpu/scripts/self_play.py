"""Self-play generation CLI — the reference ``python/scripts/self_play.py``
and ``orchestrate_selfplay.py`` equivalent (one SPMD program replaces the
process fleet; SURVEY.md §2.8).

Generates games with a model (or the uniform stub) and writes
reference-schema GameRecord JSONs.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--game", default="gomoku",
                   choices=["gomoku", "go", "chess"])
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--num-games", type=int, default=64)
    p.add_argument("--simulations", type=int, default=800)
    p.add_argument("--max-moves", type=int, default=None)
    p.add_argument("--model", default=None,
                   help="model bundle path (models/io.py); default: uniform")
    p.add_argument("--output-dir", default="data/games")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature-drop", type=int, default=30)
    p.add_argument("--wave", type=int, default=16,
                   help="virtual-loss descents per dispatched step sharing "
                   "one NN batch (the reference's BATCHED mode; 16 is the "
                   "production/bench default, see MCTSConfig.wave_size)")
    args = p.parse_args(argv)

    import jax

    from alphazero_tpu.core import registry
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.stub import make_uniform_eval_fn
    from alphazero_tpu.selfplay import game_record
    from alphazero_tpu.selfplay.actor import (
        SelfPlayConfig,
        SelfPlayOutput,
        make_host_actor,
    )

    env = registry.create_game(args.game, args.board_size)
    if args.model:
        from alphazero_tpu.models.io import load_model
        from alphazero_tpu.models.resnet import make_inference_eval_fn

        model, params = load_model(args.model, env.observation_shape)
        # BN-folded inference path (models/resnet.fold_batch_norm).
        eval_fn = make_inference_eval_fn(model, params)
    else:
        eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)

    max_moves = args.max_moves or (
        env.board_size**2 + 1 if args.game == "gomoku"
        else 2 * env.board_size**2 if args.game == "go" else 512
    )
    config = SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=args.simulations,
                        wave_size=max(1, min(args.wave, args.simulations))),
        max_moves=max_moves,
        temperature_drop_move=args.temperature_drop,
    )

    import jax.numpy as jnp

    # Host-driven actor (donated arenas) with early termination.
    step, states = make_host_actor(env, eval_fn, config, args.num_games)
    all_done = jax.jit(lambda st: jax.vmap(env.terminal_flag)(st).all())
    rng = jax.random.key(args.seed)
    t0 = time.perf_counter()
    recs = []
    think_ms = []  # per-move host wall ms (sync every 16 moves lumps there)
    t_prev = t0
    for t in range(config.max_moves):
        rng, sub = jax.random.split(rng)
        states, rec = step(states, sub)
        recs.append(rec)
        if (t + 1) % 16 == 0 and bool(all_done(states)):
            think_ms.append((time.perf_counter() - t_prev) * 1000)
            break
        now = time.perf_counter()
        think_ms.append((now - t_prev) * 1000)
        t_prev = now
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *recs)
    winner = jax.vmap(env.winner)(states)
    out = SelfPlayOutput(
        states=states,
        actions=stacked.action,
        policies=stacked.policy,
        root_values=stacked.root_value,
        to_play=stacked.to_play,
        active=stacked.active,
        ended_winner=stacked.ended_winner,
        winner=winner,
        length=stacked.active.sum(axis=0).astype(jnp.int32),
        move_states=None,
    )
    jax.block_until_ready(out.winner)
    elapsed = time.perf_counter() - t0

    records = game_record.records_from_selfplay(env, out,
                                                think_ms=think_ms)
    os.makedirs(args.output_dir, exist_ok=True)
    for i, rec in enumerate(records):
        rec.save(os.path.join(args.output_dir, f"game_{args.seed}_{i}.json"))

    moves = int(out.length.sum())
    stats = {
        "games": len(records),
        "moves": moves,
        "elapsed_s": round(elapsed, 1),
        "games_per_min": round(len(records) / elapsed * 60, 1),
        "moves_per_s": round(moves / elapsed, 1),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()

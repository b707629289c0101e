"""Flagship-config learning evidence (VERDICT r3 #4): gomoku 15x15,
6-block/64ch SE-ResNet, 800-simulation self-play on one chip.

Runs a bounded training budget, snapshotting params every EVAL_EVERY
iterations and arena-evaluating each snapshot against the iteration-0
snapshot (and its predecessor) with color swap at fixed sims —
the PRD's per-iteration Elo-growth evidence (reference PRD.md:17
expects >=100 Elo/iteration until plateau; its own training stack
publishes no curve and does not build — PARITY.md).

Outputs docs/train_flagship_gomoku15.json (pipeline history + arena
series + Elo ladder) and docs/train_flagship_gomoku15_{loss,elo}.png.

Env knobs: FLAG_ITERS (default 16), FLAG_GAMES (256), FLAG_SIMS (800),
FLAG_EVAL_EVERY (4), FLAG_EVAL_GAMES (128), FLAG_EVAL_SIMS (100).
Run on the real chip (no JAX_PLATFORMS=cpu):  python tools/train_flagship.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    iters = int(os.environ.get("FLAG_ITERS", "16"))
    games = int(os.environ.get("FLAG_GAMES", "256"))
    sims = int(os.environ.get("FLAG_SIMS", "800"))
    eval_every = int(os.environ.get("FLAG_EVAL_EVERY", "4"))
    eval_games = int(os.environ.get("FLAG_EVAL_GAMES", "128"))
    eval_sims = int(os.environ.get("FLAG_EVAL_SIMS", "100"))
    out_dir = os.environ.get("FLAG_OUT", "docs")

    from alphazero_tpu.elo.tracker import EloTracker
    from alphazero_tpu.eval.arena import ArenaConfig, play_match
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.resnet import (
        AZResNet,
        ResNetConfig,
        make_inference_eval_fn,
    )
    from alphazero_tpu.selfplay.actor import SelfPlayConfig
    from alphazero_tpu.training.learner import LearnerConfig
    from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        game="gomoku", board_size=15,
        model=ResNetConfig(),  # flagship: 6 blocks, 64 channels, BN
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=sims, wave_size=16),
            max_moves=225, temperature_drop_move=30,
        ),
        learner=LearnerConfig(total_steps=max(iters * 64, 256)),
        iterations=iters,
        games_per_iteration=games,
        train_steps_per_iteration=64,
        train_batch_size=1024,
        replay_capacity=200_000,
        min_replay_before_training=4_096,
        checkpoint_dir="/tmp/flagship_ckpt",
        checkpoint_every=10**9,  # snapshots held in memory instead
    )
    pipe = Pipeline(cfg)
    model = pipe.model

    arena_cfg = ArenaConfig(
        mcts=MCTSConfig(num_simulations=eval_sims, dirichlet_epsilon=0.0),
        max_moves=225,
    )
    match = jax.jit(
        lambda pa, pb, r: play_match(
            pipe.env,
            lambda o, t=None, _p=pa: model.apply(_p, o),
            lambda o, t=None, _p=pb: model.apply(_p, o),
            r, arena_cfg, eval_games,
        )
    )

    def snap():
        return jax.tree_util.tree_map(lambda x: x.copy(), pipe.state.params)

    snapshots = {0: snap()}
    elo = EloTracker()
    elo.add_player("iter_0")
    series = []

    t_start = time.time()
    for it in range(iters):
        entry = pipe.run_iteration(it)
        print(f"[{time.strftime('%H:%M:%S')}] iter {it}: "
              f"{json.dumps(entry)}", flush=True)
        step = it + 1
        if step % eval_every == 0 or step == iters:
            snapshots[step] = snap()
            name = f"iter_{step}"
            elo.add_player(name)
            opponents = ["iter_0"]
            prev_steps = sorted(
                s for s in snapshots if 0 < s < step
            )
            if prev_steps:
                opponents.append(f"iter_{prev_steps[-1]}")
            for opp in dict.fromkeys(opponents):
                opp_step = int(opp.split("_")[1])
                res = match(snapshots[step], snapshots[opp_step],
                            jax.random.key(9000 + step * 100 + opp_step))
                wa, wb, dr = (int(res.wins_a), int(res.wins_b),
                              int(res.draws))
                elo.add_series(name, opp, wa, wb, dr)
                rec = {"player": name, "opponent": opp,
                       "wins": wa, "losses": wb, "draws": dr,
                       "rating": round(elo.get_rating(name), 1),
                       "opp_rating": round(elo.get_rating(opp), 1)}
                series.append(rec)
                print(f"  arena {name} vs {opp}: +{wa} -{wb} ={dr} "
                      f"({rec['rating']} vs {rec['opp_rating']})",
                      flush=True)

    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "config": {
            "iterations": iters, "games_per_iteration": games,
            "simulations": sims, "eval_games": eval_games,
            "eval_sims": eval_sims, "wall_s": round(time.time() - t_start, 1),
        },
        "history": pipe.history,
        "arena_series": series,
        "elo": {p: round(elo.get_rating(p), 1)
                for p, _ in elo.leaderboard()},
    }
    out_json = os.path.join(out_dir, "train_flagship_gomoku15.json")
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_json}", flush=True)

    # Final weights as a loadable bundle (input to the arena A/Bs and to
    # scripts/export_model.py --torchscript).
    from alphazero_tpu.models.io import save_model

    bundle = os.environ.get("FLAG_MODEL_OUT", "/tmp/flagship_gomoku15")
    save_model(bundle, pipe.state.params, "resnet", pipe.env.num_actions,
               cfg.model)
    print(f"wrote {bundle} (+.json)", flush=True)

    try:
        from alphazero_tpu.utils.visualization import (
            plot_elo_history,
            plot_training_history,
        )

        p1 = plot_training_history(
            pipe.history,
            os.path.join(out_dir, "train_flagship_gomoku15_loss.png"))
        p2 = plot_elo_history(
            elo, os.path.join(out_dir, "train_flagship_gomoku15_elo.png"))
        print(f"wrote {p1} and {p2}", flush=True)
    except Exception as e:  # noqa: BLE001 — plots are best-effort
        print(f"plotting skipped: {e}", flush=True)


if __name__ == "__main__":
    main()

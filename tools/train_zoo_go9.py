"""Train a go9 net for the model zoo and rate it on the uniform-MCTS
anchor ladder (the game-generic members of eval/anchors.py; the
attack/defense anchor is gomoku-only).

Purpose: committed-weights evidence that the framework trains a SECOND
game family to real strength (the flagship covers gomoku; BENCHLOG's
go19/chess datapoints cover throughput, not learning).  Reference
analog: go flows through the same python/scripts/train.py as every game.

Outputs models (G9_MODEL_OUT, default /tmp/zoo_go9) + docs/train_zoo_go9.json.
Env knobs: G9_ITERS (16), G9_GAMES (96), G9_SIMS (192), G9_EVAL_SIMS
(128), G9_EVAL_GAMES (48), G9_LR (1e-3), G9_KOMI (7.5).  Run on the
real chip.
"""
from __future__ import annotations

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _seed(*names) -> int:
    return zlib.crc32("|".join(names).encode()) & 0x7FFFFFFF


def main():
    iters = int(os.environ.get("G9_ITERS", "16"))
    games = int(os.environ.get("G9_GAMES", "96"))
    sims = int(os.environ.get("G9_SIMS", "192"))
    eval_sims = int(os.environ.get("G9_EVAL_SIMS", "128"))
    eval_games = int(os.environ.get("G9_EVAL_GAMES", "48"))
    lr = float(os.environ.get("G9_LR", "1e-3"))
    komi = float(os.environ.get("G9_KOMI", "7.5"))

    from alphazero_tpu.elo.bradley_terry import fit_bradley_terry
    from alphazero_tpu.eval import anchors
    from alphazero_tpu.eval.arena import play_match_sides
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.io import save_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn
    from alphazero_tpu.selfplay.actor import SelfPlayConfig
    from alphazero_tpu.training.learner import LearnerConfig
    from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

    max_moves = 9 * 9 * 2
    cfg = PipelineConfig(
        game="go", board_size=9, game_options=(("komi", komi),),
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=sims, wave_size=16),
            max_moves=max_moves, temperature_drop_move=16,
        ),
        learner=LearnerConfig(
            learning_rate=lr, scheduler="warmup_cosine",
            warmup_steps=64, total_steps=max(iters * 64, 256),
        ),
        iterations=iters,
        games_per_iteration=games,
        train_steps_per_iteration=64,
        train_batch_size=1024,
        replay_capacity=200_000,
        min_replay_before_training=2_048,
        checkpoint_dir="/tmp/zoo_go9_ckpt",
        checkpoint_every=10**9,
    )
    pipe = Pipeline(cfg)
    env = pipe.env

    ladder = [n for n in anchors.POOL if n.startswith("uniform_mcts_")]
    anchor_sides = {n: anchors.make_anchor(env, n) for n in ladder}

    t0 = time.time()
    history = []
    for it in range(iters):
        entry = pipe.run_iteration(it)
        history.append(entry)
        print(f"[{time.strftime('%H:%M:%S')}] iter {it}: "
              f"{json.dumps(entry)}", flush=True)

    cand = (
        make_inference_eval_fn(pipe.model, pipe.state.params),
        MCTSConfig(num_simulations=eval_sims, dirichlet_epsilon=0.0,
                   wave_size=16),
    )
    matches = []
    for aname in ladder:
        res = play_match_sides(
            env, cand, anchor_sides[aname],
            jax.random.key(_seed("zoo_go9", aname)),
            eval_games, max_moves=max_moves, opening_random_moves=4,
        )
        rec = ("zoo_go9", aname, int(res.wins_a), int(res.wins_b),
               int(res.draws))
        matches.append(list(rec))
        print(f"  zoo_go9 vs {aname}: +{rec[2]} -{rec[3]} ={rec[4]}",
              flush=True)
    # Ladder round-robin for scale context (fixed seeds, cheap at 9x9).
    for i, na in enumerate(ladder):
        for nb in ladder[i + 1:]:
            res = play_match_sides(
                env, anchor_sides[na], anchor_sides[nb],
                jax.random.key(_seed("go9", na, nb)),
                eval_games, max_moves=max_moves, opening_random_moves=4,
            )
            matches.append([na, nb, int(res.wins_a), int(res.wins_b),
                            int(res.draws)])
            print(f"  {na} vs {nb}: +{int(res.wins_a)} -{int(res.wins_b)}"
                  f" ={int(res.draws)}", flush=True)

    ratings = fit_bradley_terry(
        [tuple(m) for m in matches], anchor=anchors.CANONICAL,
        anchor_rating=anchors.CANONICAL_RATING,
    )
    payload = {
        "config": {
            "iterations": iters, "games_per_iteration": games,
            "simulations": sims, "eval_sims": eval_sims,
            "eval_games": eval_games, "learning_rate": lr, "komi": komi,
            "wall_s": round(time.time() - t0, 1),
        },
        "history": history,
        "matches": matches,
        "bt_ratings": {k: round(v, 1) for k, v in ratings.items()},
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/train_zoo_go9.json", "w") as f:
        json.dump(payload, f, indent=2)
    print("ratings: " + json.dumps(payload["bt_ratings"]), flush=True)

    bundle = os.environ.get("G9_MODEL_OUT", "/tmp/zoo_go9")
    save_model(bundle, pipe.state.params, "resnet", env.num_actions,
               cfg.model)
    print(f"wrote {bundle} (+.json)", flush=True)


if __name__ == "__main__":
    main()

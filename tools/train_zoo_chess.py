"""Train a chess net for the model zoo and rate it on the uniform-MCTS
ladder (sibling of tools/train_zoo_go9.py; BASELINE config 4's game).

Chess at low skill draws often (max-moves adjudication = draw), so the
table reports wins/draws/losses and the Bradley-Terry fit counts draws
as half — the floor being demonstrated is "clearly above uniform
search", not gomoku-style decisiveness.  Reference analog: chess flows
through the same python/scripts/train.py as every game.

Outputs models (CZ_MODEL_OUT, default /tmp/zoo_chess) +
docs/train_zoo_chess.json.  Env knobs: CZ_ITERS (10), CZ_GAMES (96),
CZ_SIMS (160), CZ_MAX_MOVES (180), CZ_EVAL_SIMS (128), CZ_EVAL_GAMES
(32), CZ_LR (1e-3).  Run on the real chip.
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _seed(*names) -> int:
    return zlib.crc32("|".join(names).encode()) & 0x7FFFFFFF


def main():
    iters = int(os.environ.get("CZ_ITERS", "10"))
    games = int(os.environ.get("CZ_GAMES", "96"))
    sims = int(os.environ.get("CZ_SIMS", "160"))
    max_moves = int(os.environ.get("CZ_MAX_MOVES", "180"))
    eval_sims = int(os.environ.get("CZ_EVAL_SIMS", "128"))
    eval_games = int(os.environ.get("CZ_EVAL_GAMES", "32"))
    lr = float(os.environ.get("CZ_LR", "1e-3"))

    from alphazero_tpu.elo.bradley_terry import fit_bradley_terry
    from alphazero_tpu.eval import anchors
    from alphazero_tpu.eval.arena import play_match_sides
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.io import save_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn
    from alphazero_tpu.selfplay.actor import SelfPlayConfig
    from alphazero_tpu.training.learner import LearnerConfig
    from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        game="chess", board_size=8,
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=sims, wave_size=16),
            max_moves=max_moves, temperature_drop_move=20,
        ),
        learner=LearnerConfig(
            learning_rate=lr, scheduler="warmup_cosine",
            warmup_steps=64, total_steps=max(iters * 64, 256),
        ),
        iterations=iters,
        games_per_iteration=games,
        train_steps_per_iteration=64,
        train_batch_size=1024,
        replay_capacity=100_000,  # config/chess.json: 500k exceeds HBM
        min_replay_before_training=2_048,
        checkpoint_dir="/tmp/zoo_chess_ckpt",
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
            jax.random.key(_seed("zoo_chess", aname)),
            eval_games, max_moves=max_moves, opening_random_moves=2,
        )
        rec = ("zoo_chess", aname, int(res.wins_a), int(res.wins_b),
               int(res.draws))
        matches.append(list(rec))
        print(f"  zoo_chess vs {aname}: +{rec[2]} -{rec[3]} ={rec[4]}",
              flush=True)
    for i, na in enumerate(ladder):
        for nb in ladder[i + 1:]:
            res = play_match_sides(
                env, anchor_sides[na], anchor_sides[nb],
                jax.random.key(_seed("chess", na, nb)),
                eval_games, max_moves=max_moves, opening_random_moves=2,
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
            "simulations": sims, "max_moves": max_moves,
            "eval_sims": eval_sims, "eval_games": eval_games,
            "learning_rate": lr,
            "wall_s": round(time.time() - t0, 1),
        },
        "history": history,
        "matches": matches,
        "bt_ratings": {k: round(v, 1) for k, v in ratings.items()},
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/train_zoo_chess.json", "w") as f:
        json.dump(payload, f, indent=2)
    print("ratings: " + json.dumps(payload["bt_ratings"]), flush=True)

    bundle = os.environ.get("CZ_MODEL_OUT", "/tmp/zoo_chess")
    save_model(bundle, pipe.state.params, "resnet", env.num_actions,
               cfg.model)
    print(f"wrote {bundle} (+.json)", flush=True)


if __name__ == "__main__":
    main()

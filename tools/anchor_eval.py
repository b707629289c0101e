"""Rate a model bundle against the fixed anchor pool (eval/anchors.py).

The anchored Bradley-Terry scale makes the result comparable across runs
and rounds; CAND_SIMS sets the candidate's search depth, so strength can
be evaluated at the PRODUCTION operating point (800 sims/move) — the
reference evaluates models at full search strength
(python/scripts/evaluate.py).

  python tools/anchor_eval.py /tmp/flagship2_gomoku15 800

Env: AE_GAMES (64 per anchor), AE_NAME (candidate label), AE_WAVE (16),
AE_OPENING (6).  Merges the cached anchor round-robin
(docs/anchor_table.json, built by train_flagship2.py) into the fit and
appends the result to docs/anchor_evals.json.
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
    bundle = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship2_gomoku15"
    cand_sims = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    games = int(os.environ.get("AE_GAMES", "64"))
    name = os.environ.get(
        "AE_NAME", os.path.basename(bundle) + f"@{cand_sims}"
    )
    wave = int(os.environ.get("AE_WAVE", "16"))
    opening = int(os.environ.get("AE_OPENING", "6"))

    from alphazero_tpu.core import registry
    from alphazero_tpu.elo.bradley_terry import fit_bradley_terry
    from alphazero_tpu.eval import anchors
    from alphazero_tpu.eval.arena import play_match_sides
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.io import load_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    env = registry.create_game("gomoku", 15)
    model, params = load_model(bundle, env.observation_shape)
    side = (
        make_inference_eval_fn(model, params),
        MCTSConfig(num_simulations=cand_sims, dirichlet_epsilon=0.0,
                   wave_size=min(wave, cand_sims)),
    )

    matches = []
    table_path = "docs/anchor_table.json"
    if os.path.exists(table_path):
        with open(table_path) as f:
            matches.extend(tuple(r) for r in json.load(f))

    t0 = time.time()
    results = []
    for aname in anchors.POOL:
        res = play_match_sides(
            env, side, anchors.make_anchor(env, aname),
            jax.random.key(_seed(name, aname)), games, max_moves=225,
            opening_random_moves=opening,
        )
        rec = (name, aname, int(res.wins_a), int(res.wins_b),
               int(res.draws))
        matches.append(rec)
        results.append(rec)
        print(f"  {name} vs {aname}: +{rec[2]} -{rec[3]} ={rec[4]}",
              flush=True)

    ratings = fit_bradley_terry(matches, anchor=anchors.CANONICAL,
                                anchor_rating=anchors.CANONICAL_RATING)
    out = {
        "candidate": name, "bundle": bundle, "sims": cand_sims,
        "games_per_anchor": games, "opening_random_moves": opening,
        "matches": [list(r) for r in results],
        "bt_rating": round(ratings[name], 1),
        "anchor_ratings": {a: round(ratings[a], 1) for a in anchors.POOL
                           if a in ratings},
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    path = "docs/anchor_evals.json"
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(out)
    os.makedirs("docs", exist_ok=True)
    with open(path, "w") as f:
        json.dump(hist, f, indent=2)


if __name__ == "__main__":
    main()

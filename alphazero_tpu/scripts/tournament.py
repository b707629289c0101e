"""Round-robin tournament CLI — the reference
``python/scripts/tournament.py`` equivalent: all model pairs from a
directory (plus an optional uniform-random player), Elo table."""
from __future__ import annotations

import argparse
import glob
import itertools
import json
import os


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--game", default="gomoku",
                   choices=["gomoku", "go", "chess"])
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--models-dir", required=True,
                   help="directory of model bundles (*.msgpack)")
    p.add_argument("--games-per-pair", type=int, default=16)
    p.add_argument("--simulations", type=int, default=100)
    p.add_argument("--include-random", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="tournament_results.json")
    args = p.parse_args(argv)

    import jax

    from alphazero_tpu.core import registry
    from alphazero_tpu.elo.tracker import EloTracker
    from alphazero_tpu.eval.arena import ArenaConfig, play_match_host
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.scripts.evaluate import load_eval_fn

    env = registry.create_game(args.game, args.board_size)
    paths = sorted(glob.glob(os.path.join(args.models_dir, "*.msgpack")))
    players = {os.path.basename(p): p for p in paths}
    if args.include_random or not players:
        players["random"] = None
    if len(players) < 2:
        raise SystemExit("need at least 2 players")

    eval_fns = {
        name: load_eval_fn(path, env) for name, path in players.items()
    }
    max_moves = (
        env.board_size**2 + 1 if args.game == "gomoku"
        else 2 * env.board_size**2 if args.game == "go" else 512
    )
    config = ArenaConfig(
        mcts=MCTSConfig(num_simulations=args.simulations,
                        dirichlet_epsilon=0.0,
                        wave_size=min(16, args.simulations)),
        max_moves=max_moves,
        temperature=0.1,
        opening_random_moves=6,
    )

    tracker = EloTracker()
    results = []
    rng = jax.random.key(args.seed)
    for (na, nb) in itertools.combinations(sorted(players), 2):
        rng, sub = jax.random.split(rng)
        res = play_match_host(env, eval_fns[na], eval_fns[nb], sub,
                              config, args.games_per_pair)
        wa, wb, dr = int(res.wins_a), int(res.wins_b), int(res.draws)
        tracker.add_series(na, nb, wa, wb, dr)
        results.append({"a": na, "b": nb, "wins_a": wa, "wins_b": wb,
                        "draws": dr})
        print(f"{na} vs {nb}: +{wa} -{wb} ={dr}")

    table = [
        {"player": name, "elo": round(r, 1),
         "games": tracker.games_played[name]}
        for name, r in tracker.leaderboard()
    ]
    # Joint Bradley-Terry fit over the full round-robin table — order-
    # independent ratings (the sequential K=32 ladder depends on pairing
    # order; elo/bradley_terry.py).  Both are reported: "elo" mirrors the
    # reference tournament.py bookkeeping, "bt" is the consistent scale.
    from alphazero_tpu.elo.bradley_terry import fit_bradley_terry

    bt = fit_bradley_terry(
        [(r["a"], r["b"], r["wins_a"], r["wins_b"], r["draws"])
         for r in results]
    )
    bt_table = [{"player": k, "bt_elo": round(v, 1)}
                for k, v in sorted(bt.items(), key=lambda kv: -kv[1])]

    with open(args.output, "w") as f:
        json.dump({"results": results, "elo": table, "bt": bt_table},
                  f, indent=2)
    print(json.dumps({"elo": table, "bt": bt_table}))


if __name__ == "__main__":
    main()

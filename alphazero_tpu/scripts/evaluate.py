"""Model-vs-model evaluation CLI — the reference
``python/scripts/evaluate.py`` equivalent: A vs B matches with built-in
color swap, Elo delta."""
from __future__ import annotations

import argparse
import json


def load_eval_fn(model_path, env):
    if model_path is None:
        from alphazero_tpu.models.stub import make_uniform_eval_fn

        return make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    from alphazero_tpu.models.io import load_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    model, params = load_model(model_path, env.observation_shape)
    # BN-folded inference path (models/resnet.fold_batch_norm).
    return make_inference_eval_fn(model, params)


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--game", default="gomoku",
                   choices=["gomoku", "go", "chess"])
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--model-a", default=None)
    p.add_argument("--model-b", default=None)
    p.add_argument("--num-games", type=int, default=32)
    p.add_argument("--simulations", type=int, default=200)
    p.add_argument("--max-moves", type=int, default=None)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--opening-moves", type=int, default=6,
                   help="mirrored random opening plies (deep searches are "
                   "near-deterministic at low temperature; without opening "
                   "diversity every game is a replica — BENCHLOG round 5)")
    p.add_argument("--wave", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--elo-file", default=None)
    args = p.parse_args(argv)

    import jax

    from alphazero_tpu.core import registry
    from alphazero_tpu.elo.tracker import EloTracker
    from alphazero_tpu.eval.arena import ArenaConfig, play_match_host
    from alphazero_tpu.mcts.search import MCTSConfig

    env = registry.create_game(args.game, args.board_size)
    eval_a = load_eval_fn(args.model_a, env)
    eval_b = load_eval_fn(args.model_b, env)
    max_moves = args.max_moves or (
        env.board_size**2 + 1 if args.game == "gomoku"
        else 2 * env.board_size**2 if args.game == "go" else 512
    )
    config = ArenaConfig(
        mcts=MCTSConfig(
            num_simulations=args.simulations, dirichlet_epsilon=0.0,
            wave_size=min(args.wave, args.simulations),
        ),
        max_moves=max_moves,
        temperature=args.temperature,
        opening_random_moves=args.opening_moves,
    )
    # Host-driven match loop: production-depth (800-sim) evaluation works
    # (the scanned whole-match jit crashed the TPU worker there).
    res = play_match_host(env, eval_a, eval_b, jax.random.key(args.seed),
                          config, args.num_games)
    wins_a, wins_b, draws = int(res.wins_a), int(res.wins_b), int(res.draws)
    n = wins_a + wins_b + draws
    score = (wins_a + 0.5 * draws) / max(n, 1)

    name_a = args.model_a or "uniform_a"
    name_b = args.model_b or "uniform_b"
    tracker = (
        EloTracker.load(args.elo_file)
        if args.elo_file and __import__("os").path.exists(args.elo_file)
        else EloTracker()
    )
    tracker.add_series(name_a, name_b, wins_a, wins_b, draws)
    if args.elo_file:
        tracker.save(args.elo_file)

    print(json.dumps({
        "wins_a": wins_a, "wins_b": wins_b, "draws": draws,
        "score_a": round(score, 3),
        "elo_a": round(tracker.get_rating(name_a), 1),
        "elo_b": round(tracker.get_rating(name_b), 1),
    }))


if __name__ == "__main__":
    main()

"""Arena A/Bs for the two open quality questions (VERDICT r3 #7/#8).

  python tools/ab_arena.py int8   — int8 MXU trunk (the bench default
      executor: residual="int8") vs the exact BN-folded bf16 executor,
      fixed sims, in-batch color swap.  Decides whether the bench default
      hides a strength regression.
  python tools/ab_arena.py reuse  — tree reuse ON (reuse_budget="fixed",
      the reference updateWithMove semantics) vs fresh-tree search at
      EQUAL sims/move.  Demonstrates (or refutes) reuse's quality value
      on this engine.

Both load the flagship-trained bundle (tools/train_flagship.py writes
/tmp/flagship_gomoku15 by default; AB_MODEL overrides) — a trained net is
what makes strength differences measurable.  Results print as one JSON
line and append to docs/ab_results.json.

Env knobs: AB_GAMES (256), AB_SIMS (200), AB_MODEL, AB_SEED (0).
Run on the real chip.
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


def load_net():
    from alphazero_tpu.core import registry
    from alphazero_tpu.models.io import load_model

    env = registry.create_game("gomoku", 15)
    path = os.environ.get("AB_MODEL", "/tmp/flagship_gomoku15")
    model, params = load_model(path, env.observation_shape)
    return env, model, params


def calib_obs(env, params, model):
    """Mid-game calibration observations via the STANDARD helper
    (models/quant.make_rollout_calib_fn, production rollout shape) —
    the A/B measures exactly the executor the Pipeline ships."""
    from alphazero_tpu import production
    from alphazero_tpu.models.quant import make_rollout_calib_fn
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    fn = make_rollout_calib_fn(
        env, make_inference_eval_fn(model, params),
        n=production.CALIB_GAMES, plies=production.CALIB_PLIES,
        every=production.CALIB_EVERY,
    )
    return fn(None, jax.random.key(7))


def run_int8_ab(env, model, params, games, sims, seed):
    from alphazero_tpu import production
    from alphazero_tpu.eval.arena import (
        ArenaConfig,
        play_match,
        play_match_host,
    )
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.quant import make_int8_eval_fn
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    cal = calib_obs(env, params, model)
    pct = float(os.environ.get("AB_PCT",
                               str(production.INT8_CALIB_PERCENTILE)))
    wave = int(os.environ.get("AB_WAVE", "16"))
    eval_int8 = make_int8_eval_fn(model, params, calib_obs=cal,
                                  chunk=None,
                                  residual=production.INT8_RESIDUAL,
                                  heads=production.INT8_HEADS,
                                  calib_percentile=pct)
    eval_bf16 = make_inference_eval_fn(model, params)
    cfg = ArenaConfig(
        mcts=MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0,
                        wave_size=wave),
        max_moves=225,
        opening_random_moves=int(os.environ.get("AB_OPENING", "6")),
    )
    if os.environ.get("AB_HOST", "1") == "1":
        # Host-driven match loop — required at production depth (the
        # giant-scan jit crashes the TPU worker at 800 sims; VERDICT r4
        # #2 / BENCHLOG round 4 caveat).
        res = play_match_host(env, eval_int8, eval_bf16,
                              jax.random.key(seed), cfg, games)
    else:
        res = jax.jit(
            lambda r: play_match(env, eval_int8, eval_bf16, r, cfg, games)
        )(jax.random.key(seed))
    a_name = "int8_trunk_p%s" % pct if pct else "int8_trunk"
    return {"a": a_name, "b": "bf16_folded",
            "wins_a": int(res.wins_a), "wins_b": int(res.wins_b),
            "draws": int(res.draws)}


def run_reuse_ab(env, model, params, games, sims, seed):
    """Host-driven per-side match (eval/arena.play_match_sides): A keeps
    its tree across ALL moves (re-rooted through both players' actions,
    reference updateWithMove), B searches fresh every turn.  Equal
    sims/move, mirrored random openings, two color-swapped halves."""
    from alphazero_tpu.eval.arena import play_match_sides
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    eval_fn = make_inference_eval_fn(model, params)
    wave = int(os.environ.get("AB_WAVE", "16"))
    cfg_on = MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0,
                        tree_reuse=True, reuse_budget="fixed",
                        wave_size=wave)
    cfg_off = MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0,
                         wave_size=wave)
    res = play_match_sides(
        env, (eval_fn, cfg_on), (eval_fn, cfg_off),
        jax.random.key(seed), games, max_moves=225,
        opening_random_moves=int(os.environ.get("AB_OPENING", "6")),
    )
    return {"a": "reuse_fixed", "b": "fresh_tree",
            "wins_a": int(res.wins_a), "wins_b": int(res.wins_b),
            "draws": int(res.draws)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
    games = int(os.environ.get("AB_GAMES", "256"))
    sims = int(os.environ.get("AB_SIMS", "200"))
    seed = int(os.environ.get("AB_SEED", "0"))

    env, model, params = load_net()
    t0 = time.time()
    if mode == "int8":
        rec = run_int8_ab(env, model, params, games, sims, seed)
    elif mode == "reuse":
        rec = run_reuse_ab(env, model, params, games, sims, seed)
    else:
        raise SystemExit(f"unknown mode {mode!r} (int8|reuse)")

    n = rec["wins_a"] + rec["wins_b"] + rec["draws"]
    score = (rec["wins_a"] + 0.5 * rec["draws"]) / max(n, 1)
    import math

    elo = (-400 * math.log10(1 / min(max(score, 1e-6), 1 - 1e-6) - 1)
           if 0 < score < 1 else float("inf") * (1 if score >= 1 else -1))
    rec.update({
        "mode": mode, "games": n, "sims": sims,
        "wave": int(os.environ.get("AB_WAVE", "16")),
        "score_a": round(score, 4),
        "elo_delta_a": round(elo, 1) if math.isfinite(elo) else str(elo),
        "wall_s": round(time.time() - t0, 1),
    })
    print(json.dumps(rec))
    out = "docs/ab_results.json"
    hist = []
    if os.path.exists(out):
        with open(out) as f:
            hist = json.load(f)
    hist.append(rec)
    os.makedirs("docs", exist_ok=True)
    with open(out, "w") as f:
        json.dump(hist, f, indent=2)


if __name__ == "__main__":
    main()

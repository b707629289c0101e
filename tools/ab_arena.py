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


def calib_obs(env, params, model, n=512, seed=7):
    """Mid-game observations for int8 calibration: greedy-policy rollouts
    (a trained net needs real activation ranges, not empty boards)."""
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    eval_fn = jax.jit(make_inference_eval_fn(model, params))
    states = jax.vmap(lambda _: env.init())(jnp.arange(n))
    rng = jax.random.key(seed)

    @jax.jit
    def pol_move(states, r):
        obs = jax.vmap(env.observation)(states)
        logits, _ = eval_fn(obs)
        legal = jax.vmap(env.legal_mask)(states)
        p = jnp.where(legal, logits, -1e9)
        acts = jax.random.categorical(r, p)
        return jax.vmap(env.step)(states, acts.astype(jnp.int32))

    obs_list = [jax.vmap(env.observation)(states)]
    for i in range(12):
        rng, sub = jax.random.split(rng)
        states = pol_move(states, sub)
        if i % 4 == 3:
            obs_list.append(jax.vmap(env.observation)(states))
    return jnp.concatenate(obs_list)


def run_int8_ab(env, model, params, games, sims, seed):
    from alphazero_tpu.eval.arena import ArenaConfig, play_match
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.quant import make_int8_eval_fn
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    cal = calib_obs(env, params, model)
    pct = float(os.environ.get("AB_PCT", "0"))
    eval_int8 = make_int8_eval_fn(model, params, calib_obs=cal,
                                  chunk=None, residual="int8",
                                  calib_percentile=pct)
    eval_bf16 = make_inference_eval_fn(model, params)
    cfg = ArenaConfig(
        mcts=MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0),
        max_moves=225,
    )
    res = jax.jit(
        lambda r: play_match(env, eval_int8, eval_bf16, r, cfg, games)
    )(jax.random.key(seed))
    a_name = ("int8_trunk_p%s" % os.environ["AB_PCT"]
          if os.environ.get("AB_PCT") else "int8_trunk")
    return {"a": a_name, "b": "bf16_folded",
            "wins_a": int(res.wins_a), "wins_b": int(res.wins_b),
            "draws": int(res.draws)}


def run_reuse_ab(env, model, params, games, sims, seed):
    """Host-driven match: A keeps its tree across ALL moves (re-rooted
    through both players' actions, reference updateWithMove), B searches
    fresh every turn.  Equal sims/move.  Two halves swap colors."""
    from alphazero_tpu.mcts.search import (
        HostReuseSearch,
        MCTSConfig,
        make_host_search,
        select_action,
    )
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    eval_fn = make_inference_eval_fn(model, params)
    cfg_on = MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0,
                        tree_reuse=True, reuse_budget="fixed")
    cfg_off = MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0)
    B = games // 2

    step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
    winner_of = jax.jit(lambda s: jax.vmap(env.winner)(s))
    all_done = jax.jit(
        lambda s: jax.vmap(env.terminal_flag)(s).all()
    )

    def half(a_is_black, rng):
        e_on = HostReuseSearch(env, eval_fn, cfg_on)
        e_off = make_host_search(env, eval_fn, cfg_off)
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        for t in range(225):
            rng, s_rng, a_rng, adv_rng = jax.random.split(rng, 4)
            mover_black = t % 2 == 0
            a_moves = mover_black == a_is_black
            out = e_on(states, s_rng) if a_moves else e_off(states, s_rng)
            action = select_action(a_rng, out.visit_counts,
                                   jnp.float32(0.1))
            states = step(states, action.astype(jnp.int32))
            # Carry A's tree through EVERY played action (own and
            # opponent's) — reference updateWithMove semantics.
            e_on.advance(None, action.astype(jnp.int32), states, adv_rng)
            if (t + 1) % 16 == 0 and bool(all_done(states)):
                break
        w = winner_of(states)
        a_color = 0 if a_is_black else 1
        wins_a = int(jnp.sum(w == a_color))
        wins_b = int(jnp.sum((w >= 0) & (w != a_color)))
        draws = B - wins_a - wins_b
        return wins_a, wins_b, draws

    r1 = half(True, jax.random.key(seed))
    r2 = half(False, jax.random.key(seed + 1))
    return {"a": "reuse_fixed", "b": "fresh_tree",
            "wins_a": r1[0] + r2[0], "wins_b": r1[1] + r2[1],
            "draws": r1[2] + r2[2]}


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

"""Regression smoke suite.

Parity: the reference python/scripts/regression_test.py (736-LoC unittest
suite across games/MCTS/NN/self-play/perf with skip flags).  This runner
exercises the same surface quickly in-process and reports one JSON line per
check — intended for CI gates outside pytest.
"""
from __future__ import annotations

import argparse
import json
import time
import traceback


def check(name, fn, results):
    t0 = time.perf_counter()
    try:
        fn()
        results.append({"check": name, "ok": True,
                        "s": round(time.perf_counter() - t0, 2)})
    except Exception as e:  # noqa: BLE001
        results.append({
            "check": name, "ok": False, "error": f"{type(e).__name__}: {e}",
            "trace": traceback.format_exc(limit=3),
        })
    print(json.dumps(results[-1]))


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip-perf", action="store_true")
    p.add_argument("--games", default="gomoku,go,chess")
    args = p.parse_args(argv)
    games = args.games.split(",")

    import jax
    import jax.numpy as jnp

    from alphazero_tpu.core import registry
    from alphazero_tpu.mcts.search import MCTSConfig, search
    from alphazero_tpu.models.resnet import AZResNet, ResNetConfig
    from alphazero_tpu.models.stub import make_uniform_eval_fn
    from alphazero_tpu.selfplay.actor import SelfPlayConfig, play_games

    results = []

    def game_checks(name):
        env = registry.create_game(name, None)

        def init_and_step():
            s = env.init()
            legal = env.legal_mask(s)
            assert int(legal.sum()) > 0
            import numpy as np

            a = int(np.nonzero(np.asarray(legal))[0][0])
            s2 = env.step(s, jnp.asarray(a))
            assert int(s2.move_count) == 1
            obs = env.observation(s2)
            assert obs.shape == env.observation_shape

        check(f"{name}.init_step_obs", init_and_step, results)

        def search_runs():
            eval_fn = make_uniform_eval_fn(env.num_actions)
            cfg = MCTSConfig(num_simulations=16, dirichlet_epsilon=0.0)
            states = jax.vmap(lambda _: env.init())(jnp.arange(2))
            out = jax.jit(
                lambda s, r: search(env, eval_fn, s, r, cfg)
            )(states, jax.random.key(0))
            assert int(out.visit_counts.sum()) == 32

        check(f"{name}.search", search_runs, results)

    for g in games:
        game_checks(g)

    def selfplay_completes():
        env = registry.create_game("gomoku", 5)
        eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
        cfg = SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=8), max_moves=25,
            temperature_drop_move=4,
        )
        out = jax.jit(
            lambda r: play_games(env, eval_fn, r, cfg, batch_size=4)
        )(jax.random.key(0))
        assert bool(jnp.all(out.length > 0))

    check("selfplay.completes", selfplay_completes, results)

    def model_forward():
        env = registry.create_game("gomoku", 9)
        model = AZResNet(num_actions=env.num_actions,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        obs = jnp.zeros((2,) + env.observation_shape)
        params = model.init(jax.random.key(0), obs)
        logits, value = model.apply(params, obs)
        assert logits.shape == (2, env.num_actions)

    check("model.forward", model_forward, results)

    if not args.skip_perf:
        def perf_floor():
            env = registry.create_game("gomoku", 15)
            eval_fn = make_uniform_eval_fn(env.num_actions)
            cfg = MCTSConfig(num_simulations=50, dirichlet_epsilon=0.0)
            states = jax.vmap(lambda _: env.init())(jnp.arange(8))
            run = jax.jit(
                lambda s, r: search(env, eval_fn, s, r, cfg).visit_counts
            )
            run(states, jax.random.key(0)).block_until_ready()
            t0 = time.perf_counter()
            run(states, jax.random.key(1)).block_until_ready()
            dt = time.perf_counter() - t0
            sims_per_s = 8 * 50 / dt
            assert sims_per_s > 100, f"{sims_per_s:.0f} sims/s"

        check("perf.search_floor", perf_floor, results)

    bad = [r for r in results if not r["ok"]]
    print(json.dumps({"total": len(results), "failed": len(bad)}))
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()

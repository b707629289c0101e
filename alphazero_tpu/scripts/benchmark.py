"""Benchmark CLI — the reference ``python/scripts/benchmark.py``
equivalent: NN inference throughput, batched-search throughput, env-step
throughput; JSON output."""
from __future__ import annotations

import argparse
import json
import time


def timeit(fn, *args, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--game", default="gomoku",
                   choices=["gomoku", "go", "chess"])
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--simulations", type=int, default=800)
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--channels", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from alphazero_tpu.core import registry
    from alphazero_tpu.mcts.search import MCTSConfig, search
    from alphazero_tpu.models.resnet import AZResNet, ResNetConfig

    env = registry.create_game(args.game, args.board_size)
    model = AZResNet(
        num_actions=env.num_actions,
        cfg=ResNetConfig(num_blocks=args.blocks, channels=args.channels),
    )
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1,) + env.observation_shape, jnp.float32),
    )

    results = {}
    B = args.batch

    # NN inference
    obs = jnp.zeros((B,) + env.observation_shape, jnp.float32)
    infer = jax.jit(lambda o: model.apply(params, o))
    dt = timeit(infer, obs)
    results["nn_inference"] = {
        "batch": B,
        "latency_ms": round(dt * 1e3, 2),
        "positions_per_s": round(B / dt),
    }

    # Env stepping
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    acts = jnp.zeros((B,), jnp.int32)
    step = jax.jit(jax.vmap(env.step))
    dt = timeit(step, states, acts)
    results["env_step"] = {
        "batch": B,
        "latency_ms": round(dt * 1e3, 2),
        "steps_per_s": round(B / dt),
    }

    # Batched search
    def eval_fn(o, tp=None):
        return model.apply(params, o)

    cfg = MCTSConfig(num_simulations=args.simulations)
    srch = jax.jit(lambda s, r: search(env, eval_fn, s, r, cfg))
    dt = timeit(srch, states, jax.random.key(1), warmup=1, iters=2)
    results["search"] = {
        "batch": B,
        "simulations": args.simulations,
        "latency_s": round(dt, 2),
        "sims_per_s": round(B * args.simulations / dt),
        "moves_per_s": round(B / dt, 1),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Decompose self-play search cost on the real chip.

Times, per simulation: full search, NN forward alone, env-step+obs+legal
alone, select-loop alone, backprop alone — to find where the per-sim 35ms
goes at batch 1024.
"""
# NOTE: rep-loop timings via block_until_ready are INVALID on the
# tunneled axon platform (async dispatch; only host fetches sync —
# see BENCHLOG.md "Axon timing caveat").  Prefer the chained
# fori_loop + scalar-fetch methodology in tools/profile_int8.py.

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts import search as S
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn

B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))

env = GomokuEnv(board_size=15)
model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
params = model.init(jax.random.key(0),
                    jnp.zeros((1,) + env.observation_shape))


def eval_fn(obs, to_play=None):
    return model.apply(params, obs)


uniform = make_uniform_eval_fn(env.num_actions)
states = jax.vmap(lambda _: env.init())(jnp.arange(B))
cfg = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)


def bench(name, fn, *args, iters=2):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"name": name, "time_s": round(dt, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return dt


# 1. full search with NN
full = jax.jit(lambda s, r: S.search(env, eval_fn, s, r, cfg).visit_counts)
t_full = bench("search_nn", full, states, jax.random.key(1))

# 2. full search with uniform stub (no NN cost)
stub = jax.jit(lambda s, r: S.search(env, uniform, s, r, cfg).visit_counts)
t_stub = bench("search_stub", stub, states, jax.random.key(1))

# 3. NN forward x SIMS (sequential scan to mimic search's serialization)
obs = jnp.zeros((B,) + env.observation_shape)


@jax.jit
def nn_many(o):
    def body(c, _):
        logits, v = eval_fn(o + c)
        return c + v.mean() * 0, logits.mean()

    return jax.lax.scan(body, 0.0, None, length=SIMS)[1].sum()


t_nn = bench("nn_forward_x_sims", nn_many, obs)

# 4. env step + obs + legal + masked softmax, x SIMS
acts = jnp.zeros((B,), jnp.int32)


@jax.jit
def env_many(st):
    def body(c, _):
        ns = jax.vmap(env.step)(c, acts)
        o = jax.vmap(env.observation)(ns)
        lg = jax.vmap(env.legal_mask)(ns)
        p = S.masked_softmax(jnp.zeros((B, env.num_actions)), lg)
        return c, p.mean() + o.mean()

    return jax.lax.scan(body, st, None, length=SIMS)[1].sum()


t_env = bench("env_step_x_sims", env_many, states)

# 5. tree ops only: search where eval is free and env.step is identity-ish —
# approximate by subtracting.
print(json.dumps({
    "per_sim_ms": {
        "search_nn": round(t_full / SIMS * 1e3, 3),
        "search_stub": round(t_stub / SIMS * 1e3, 3),
        "nn": round(t_nn / SIMS * 1e3, 3),
        "env": round(t_env / SIMS * 1e3, 3),
        "tree_overhead_est": round((t_stub - t_env) / SIMS * 1e3, 3),
    }
}), flush=True)

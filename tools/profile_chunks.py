"""Find the optimal host-loop chunk size for the sim loop."""
# NOTE: rep-loop timings via block_until_ready are INVALID on the
# tunneled axon platform (async dispatch; only host fetches sync —
# see BENCHLOG.md "Axon timing caveat").  Prefer the chained
# fori_loop + scalar-fetch methodology in tools/profile_int8.py.

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools

import jax.numpy as jnp

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts import search as S
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn

B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = 800

env = GomokuEnv(board_size=15)
model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
params = model.init(jax.random.key(0),
                    jnp.zeros((1,) + env.observation_shape))


def eval_nn(obs, to_play=None):
    return model.apply(params, obs)


states = jax.vmap(lambda _: env.init())(jnp.arange(B))
cfg = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)


@jax.jit
def init_fn(root_states, rng):
    obs = jax.vmap(env.observation)(root_states)
    logits, value = eval_nn(obs)
    return S.instantiate_tree(env, root_states, logits, value, cfg, rng)


def run_chunked(chunk):
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def chunk_fn(tree, start, n):
        def body(t, i):
            return S._simulate_once(env, eval_nn, t, start + i, cfg), ()

        t2, _ = jax.lax.scan(body, tree, jnp.arange(n))
        return t2

    tree = init_fn(states, jax.random.key(1))
    # warm compile
    tree = chunk_fn(tree, jnp.int32(0), chunk)
    jax.block_until_ready(tree.visits)
    t0 = time.time()
    for s in range(chunk, SIMS, chunk):
        tree = chunk_fn(tree, jnp.int32(s), chunk)
    jax.block_until_ready(tree.visits)
    dt = time.time() - t0
    n_sims = SIMS - chunk
    print(json.dumps({"chunk": chunk,
                      "per_sim_ms": round(dt / n_sims * 1e3, 3),
                      "sims_per_s": round(B * n_sims / dt)}), flush=True)


for chunk in (1, 4, 16, 64):
    run_chunked(chunk)

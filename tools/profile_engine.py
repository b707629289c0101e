"""Engine (non-NN) per-simulation phase decomposition on the real chip.

Valid axon methodology (BENCHLOG "Round-2 correction"): chain each phase R
times inside one jit with a data-dependent tree carry, warm with one rng,
time with another, difference R=6 vs R=60, median of 3.

Phases at the bench config (B=1024, gomoku15, uniform eval):
  full   — _simulate_once (the whole engine step)
  select — PUCT descent only (leaf folded back into visits)
  leaf   — leaf-state gather + unpack + env.step + obs + legal +
           masked_softmax + approx_max_k (the expansion data path)
  write  — arena row writes + links + backprop masks (approximated by
           full - select - leaf)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.games.gomoku import GomokuEnv  # noqa: E402
from alphazero_tpu.mcts import search as S  # noqa: E402
from alphazero_tpu.models.stub import make_uniform_eval_fn  # noqa: E402


B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))

env = GomokuEnv(board_size=15)
uniform = make_uniform_eval_fn(env.num_actions)
cfg = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)


@jax.jit
def make_tree(rng):
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    obs = jax.vmap(env.observation)(states)
    logits, value = uniform(obs, None)
    tree = S.instantiate_tree(env, states, logits, value, cfg, rng)
    # Pre-run some sims so the arena is non-trivial.
    def body(t, sim):
        return S._simulate_once(env, uniform, t, sim + 1, cfg), ()
    tree, _ = jax.lax.scan(body, tree, jnp.arange(64))
    return tree


def dev_time(name, step, r1=6, r2=60, reps=3):
    import statistics

    t_warm = make_tree(jax.random.key(0))
    t_time = make_tree(jax.random.key(1))
    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(partial(
            lambda r, t: jax.lax.fori_loop(0, r, step, t), r))
        float(jnp.sum(fs[r](t_warm).visits))  # warm + sync
    deltas = []
    for _ in range(reps):
        ts = {}
        for r in (r1, r2):
            t0 = time.perf_counter()
            float(jnp.sum(fs[r](t_time).visits))
            ts[r] = time.perf_counter() - t0
        deltas.append((ts[r2] - ts[r1]) / (r2 - r1) * 1e3)
    dt = statistics.median(deltas)
    print(f"{name:28s} {dt:7.3f} ms/sim  (deltas "
          f"{['%.3f' % d for d in deltas]})", flush=True)
    return dt


def main():
    N = cfg.num_nodes

    def full_step(i, tree):
        return S._simulate_once(env, uniform, tree, 65 + (i % 32), cfg)

    t_full = dev_time("full engine sim", full_step)

    def select_step(i, tree):
        sel = S._select(tree, cfg)
        # Fold the selection into the tree so the chain is data-dependent.
        return tree.replace(
            visits=tree.visits + sel.leaf_onehot.astype(jnp.int32)
        )

    t_sel = dev_time("select (PUCT descent)", select_step)

    proto = env.init()

    def leaf_step(i, tree):
        oh = S._onehot(
            (tree.visits[:, 0] + i) % jnp.int32(64), N
        )
        leaf_packed = S._gather_leaf_states(tree.states, oh, B, N)
        leaf_state = S._unpack_state(leaf_packed, proto, env)
        action = jnp.argmax(
            jax.vmap(env.legal_mask)(leaf_state).astype(jnp.float32), -1
        ).astype(jnp.int32)
        child = jax.vmap(env.step)(leaf_state, action)
        obs = jax.vmap(env.observation)(child)
        logits, value = uniform(obs, None)
        legal = jax.vmap(env.legal_mask)(child)
        prior = S.masked_softmax(logits, legal)
        topv, topa = jax.lax.approx_max_k(prior, 32)
        return tree.replace(
            visits=tree.visits.at[:, 0].add(
                topa[:, 0].astype(jnp.int32) % 2
            )
        )

    t_leaf = dev_time("leaf gather+step+obs+prior", leaf_step)
    print(f"{'residual (writes+backprop)':28s} {t_full - t_sel - t_leaf:7.3f} ms/sim")


if __name__ == "__main__":
    main()

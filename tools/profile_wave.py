"""Wave-engine ablation profiling with the PRODUCTION execution shape:
host-driven per-wave executables with donated arenas, timing 800-sim
searches end-to-end with a host fetch per search (exactly how bench.py
runs).

Each variant swaps one piece of the leaf pipeline / evaluator; differences
between variants attribute cost to that piece.  The uniform stub ignores
``obs`` entirely, so XLA DCEs env.observation — "engine-only" numbers
therefore EXCLUDE obs cost; the ``obs-forced`` variant adds it back.

Run from /root/repo on the real chip (no JAX_PLATFORMS).
  PROF_WAVE=16 PROF_BATCH=1024 python tools/profile_wave.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.mcts import search as S  # noqa: E402
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig  # noqa: E402
from alphazero_tpu.models.quant import make_int8_eval_fn  # noqa: E402
from alphazero_tpu.models.stub import make_uniform_eval_fn  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))
W = int(os.environ.get("PROF_WAVE", "16"))
REPS = int(os.environ.get("PROF_REPS", "3"))
MIDGAME = os.environ.get("PROF_MIDGAME", "0") == "1"

env = registry.create_game("gomoku", 15)
cfg = S.MCTSConfig(num_simulations=SIMS, wave_size=W)

model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
rng = jax.random.key(0)
params = model.init(rng, jnp.zeros((1,) + env.observation_shape, jnp.float32))
calib = jax.vmap(env.observation)(jax.vmap(lambda _: env.init())(jnp.arange(8)))
int8_eval = make_int8_eval_fn(model, params, calib_obs=calib)
stub_eval = make_uniform_eval_fn(env.num_actions, value_noise=0.1)


def obs_forced_eval(obs, to_play):
    """~zero-FLOP evaluator that still forces env.observation + a reduce."""
    s = jnp.sum(obs.astype(jnp.bfloat16), axis=(1, 2, 3)).astype(jnp.float32)
    logits = jnp.zeros((obs.shape[0], env.num_actions), jnp.float32)
    return logits + s[:, None] * 1e-6, jnp.tanh(s * 1e-3)


def make_states():
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    if MIDGAME:
        r = jax.random.key(7)
        for i in range(40):
            r, k = jax.random.split(r)
            legal = jax.vmap(env.legal_mask)(states)
            a = jax.random.categorical(k, jnp.where(legal, 0.0, -1e9))
            states = jax.vmap(env.step)(states, a.astype(jnp.int32))
    return states


def run_search(eval_fn, label):
    fn = S.make_host_search(env, eval_fn, cfg)
    states = make_states()
    r = jax.random.key(1)
    out = fn(states, r)  # compile
    out.visit_counts.block_until_ready()
    float(jnp.sum(out.root_value))  # force fetch
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        out = fn(states, jax.random.key(2 + i))
        float(jnp.sum(out.root_value))
        times.append(time.perf_counter() - t0)
    t = min(times)
    per_sim = t / SIMS * 1e3
    print(f"{label:28s} {t*1e3:8.1f} ms/search  {per_sim:6.3f} ms/sim  "
          f"-> {B / t:7.1f} moves/s-equiv", flush=True)
    return t


print(f"B={B} sims={SIMS} W={W} midgame={MIDGAME}")
t_stub = run_search(stub_eval, "stub (no obs: engine only)")
t_obs = run_search(obs_forced_eval, "stub + obs forced")
t_int8 = run_search(int8_eval, "int8 NN (production)")
print(f"obs+layout cost: {(t_obs - t_stub) / SIMS * 1e3:.3f} ms/sim")
print(f"NN-only cost:    {(t_int8 - t_obs) / SIMS * 1e3:.3f} ms/sim")

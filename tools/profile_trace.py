"""Capture a jax.profiler trace of production wave steps and print a
per-op device-time breakdown (aggregated by fusion/op name).

Run on the real chip:  python tools/profile_trace.py
"""
import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.mcts import search as S  # noqa: E402
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig  # noqa: E402
from alphazero_tpu.models.quant import make_int8_eval_fn  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "1024"))
W = int(os.environ.get("PROF_WAVE", "16"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))
STEPS = int(os.environ.get("PROF_STEPS", "6"))
TRACE_DIR = "/tmp/jaxtrace"

env = registry.create_game("gomoku", 15)
cfg = S.MCTSConfig(num_simulations=SIMS, wave_size=W)
model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
params = model.init(jax.random.key(0),
                    jnp.zeros((1,) + env.observation_shape, jnp.float32))
calib = jax.vmap(env.observation)(
    jax.vmap(lambda _: env.init())(jnp.arange(8)))
eval_fn = make_int8_eval_fn(model, params, calib_obs=calib)

search_fn = S.make_host_search(env, eval_fn, cfg)
states = jax.vmap(lambda _: env.init())(jnp.arange(B))

# Warm up (compile everything; also puts the tree mid-search shape in play).
out = search_fn(states, jax.random.key(1))
float(jnp.sum(out.root_value))

os.system(f"rm -rf {TRACE_DIR}")
jax.profiler.start_trace(TRACE_DIR)
out = search_fn(states, jax.random.key(2))
float(jnp.sum(out.root_value))
jax.profiler.stop_trace()
print("trace captured", flush=True)

# ---- parse xplane ----
paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

for path in paths:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name} ==")
        ev_meta = plane.event_metadata
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "XLA Op" not in lname \
                    and "Steps" not in lname:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                total[name] += ev.duration_ps / 1e9  # ms
                count[name] += 1
        rows = sorted(total.items(), key=lambda kv: -kv[1])
        ssum = sum(total.values())
        print(f"total op time: {ssum:.2f} ms over {sum(count.values())} events")
        for name, ms in rows[:45]:
            print(f"{ms:9.3f} ms  x{count[name]:5d}  {name[:110]}")

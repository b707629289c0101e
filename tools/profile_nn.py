"""Profile AZResNet forward variants on the real chip (B=1024, gomoku15).

Where does the 2.0 ms/forward go?  Times the bench config against ablations
(no GroupNorm, bare conv trunk, wider-shallower trunk, padded spatial) to
find the next utilization lever.  Run WITHOUT JAX_PLATFORMS=cpu.
"""
# NOTE: rep-loop timings via block_until_ready are INVALID on the
# tunneled axon platform (async dispatch; only host fetches sync —
# see BENCHLOG.md "Axon timing caveat").  Prefer the chained
# fori_loop + scalar-fetch methodology in tools/profile_int8.py.

import time

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.models.resnet import AZResNet, ResNetConfig

B, A = 1024, 225


def timeit(fwd, obs, reps=50):
    jax.block_until_ready(fwd(obs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(obs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def bench_cfg(name, cfg, hw=15):
    model = AZResNet(num_actions=A, cfg=cfg)
    obs = jnp.zeros((B, 11, hw, hw), jnp.float32)
    params = model.init(jax.random.key(0), obs[:1])
    ms = timeit(jax.jit(lambda o: model.apply(params, o)), obs)
    convs = 1 + 2 * cfg.num_blocks
    flops = 2 * B * hw * hw * 9 * cfg.channels * cfg.channels * convs
    print(f"{name:36s} {ms:7.3f} ms  ~{flops/ms/1e9:6.1f} TFLOP/s (3x3 only)",
          flush=True)
    return ms


class BareTrunk(nn.Module):
    """Just the 3x3 convs + relu — isolates conv cost from SE/GN/heads."""
    channels: int = 64
    n_convs: int = 13

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x.astype(jnp.bfloat16), (0, 2, 3, 1))
        for _ in range(self.n_convs):
            x = nn.Conv(self.channels, (3, 3), padding="SAME",
                        use_bias=False, dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
        return x.astype(jnp.float32).mean()


def bench_bare(name, ch, n_convs, hw=15):
    model = BareTrunk(channels=ch, n_convs=n_convs)
    obs = jnp.zeros((B, 11, hw, hw), jnp.float32)
    params = model.init(jax.random.key(0), obs[:1])
    ms = timeit(jax.jit(lambda o: model.apply(params, o)), obs)
    flops = 2 * B * hw * hw * 9 * ch * ch * n_convs
    print(f"{name:36s} {ms:7.3f} ms  ~{flops/ms/1e9:6.1f} TFLOP/s",
          flush=True)
    return ms


if __name__ == "__main__":
    base = ResNetConfig()
    bench_cfg("base 6x64 SE+GN 15x15", base)
    bench_cfg("no GroupNorm", ResNetConfig(norm="none"))
    bench_cfg("3 blocks x 128ch", ResNetConfig(num_blocks=3, channels=128))
    bench_cfg("6x64 @ 16x16 (padded spatial)", base, hw=16)
    bench_bare("bare conv 13x 64ch 15x15", 64, 13)
    bench_bare("bare conv 13x 64ch 16x16", 64, 13, hw=16)
    bench_bare("bare conv 13x 128ch 15x15", 128, 13)
    bench_bare("bare conv 7x 128ch 15x15", 128, 7)

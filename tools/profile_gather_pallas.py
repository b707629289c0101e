"""Pallas row-gather vs XLA gather vs one-hot einsum on the chip."""
# NOTE: rep-loop timings via block_until_ready are INVALID on the
# tunneled axon platform (async dispatch; only host fetches sync —
# see BENCHLOG.md "Axon timing caveat").  Prefer the chained
# fori_loop + scalar-fetch methodology in tools/profile_int8.py.

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from alphazero_tpu.ops.gather_rows import gather_rows

B, N, K = 1024, 801, 32
arr = jax.random.normal(jax.random.key(0), (B, N, K), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (B,), 0, N)
b = jnp.arange(B)


def bench(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"name": name,
                      "us": round((time.time() - t0) / iters * 1e6)}),
          flush=True)


import numpy as np

ref = np.asarray(arr)[np.arange(B), np.asarray(idx)]
out = gather_rows(arr, idx)
np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
print("correct on TPU", flush=True)

bench("pallas_gather_rows", gather_rows, arr, idx)
bench("xla_gather", jax.jit(lambda a, i: a[b, i]), arr, idx)


@jax.jit
def onehot_gather(a, i):
    oh = (i[:, None] == jnp.arange(N)[None, :]).astype(jnp.bfloat16)
    return jnp.einsum("bn,bnk->bk", oh, a,
                      preferred_element_type=jnp.float32)


bench("onehot_einsum", onehot_gather, arr, idx)

"""Gather vs one-hot-matmul microbenchmarks on the chip."""
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
import jax.numpy as jnp

B = int(os.environ.get("PROF_BATCH", "1024"))
N, A = 801, 225

key = jax.random.key(0)
prior = jax.random.normal(key, (B, N, A), jnp.bfloat16)
visits = jax.random.randint(key, (B, N), 0, 100).astype(jnp.int32)
children = jax.random.randint(key, (B, N, A), -1, N).astype(jnp.int16)
node = jax.random.randint(key, (B,), 0, N)
cidx = jax.random.randint(key, (B, A), 0, N)
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


# row gather [B, A] from [B, N, A]
bench("row_gather_prior", jax.jit(lambda p, n: p[b, n]), prior, node)


@jax.jit
def row_onehot(p, n):
    oh = (n[:, None] == jnp.arange(N)[None, :]).astype(jnp.bfloat16)
    return jnp.einsum("bn,bna->ba", oh, p)


bench("row_onehot_prior", row_onehot, prior, node)

# dynamic_slice per row via vmap
bench(
    "row_dynslice_prior",
    jax.jit(
        jax.vmap(lambda p, n: jax.lax.dynamic_slice(p, (n, 0), (1, A))[0])
    ),
    prior, node,
)

# scattered stat gather [B, A] from [B, N]
bench(
    "taa_visits",
    jax.jit(lambda v, c: jnp.take_along_axis(v, c, axis=1)),
    visits, cidx,
)


@jax.jit
def taa_onehot(v, c):
    oh = (c[:, :, None] == jnp.arange(N)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("ban,bn->ba", oh, v.astype(jnp.bfloat16))


bench("taa_onehot_visits", taa_onehot, visits, cidx)

# children row gather (int16)
bench("row_gather_children", jax.jit(lambda ch, n: ch[b, n]), children, node)

# scatter one row into [B, N, A]
val = jnp.zeros((B, A), jnp.bfloat16)
bench(
    "scatter_row_prior",
    jax.jit(lambda p, n, v: p.at[b, n].set(v)),
    prior, node, val,
)


@jax.jit
def scatter_onehot(p, n, v):
    oh = (n[:, None] == jnp.arange(N)[None, :]).astype(jnp.bfloat16)
    return p + oh[:, :, None] * (v[:, None, :] - 0)  # approx add-only


bench("scatter_row_onehot_add", scatter_onehot, prior, node, val)

# scalar scatter into [B, N]
bench(
    "scatter_scalar_visits",
    jax.jit(lambda v, n: v.at[b, n].add(1)),
    visits, node,
)


@jax.jit
def scatter_scalar_onehot(v, n):
    oh = (n[:, None] == jnp.arange(N)[None, :]).astype(jnp.int32)
    return v + oh


bench("scatter_scalar_onehot", scatter_scalar_onehot, visits, node)

# scalar gather [B] from [B, N, A] (children[b, node, action])
act = jax.random.randint(key, (B,), 0, A)
bench(
    "elem_gather_children",
    jax.jit(lambda ch, n, a: ch[b, n, a]),
    children, node, act,
)

"""On-device replay buffer with dihedral augmentation.

TPU-native counterpart of the reference ``Dataset``
(``include/alphazero/selfplay/dataset.h:22-117``, ``src/selfplay/dataset.cpp``):
where the reference replays stored GameRecords through a fresh C++ state to
regenerate enhanced tensors (dataset.cpp:64-114), this buffer stores compact
env-state snapshots (the struct-of-arrays pytree itself) plus (pi, z) targets
in a device ring, regenerating observations with ``env.observation`` inside
the jitted learner step.  The 8x dihedral augmentation
(dataset.cpp:245-380) becomes a static table of policy index permutations +
``rot90``/``flip`` on the plane stack, chosen per-sample at sampling time.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ReplayBuffer:
    states: Any  # env-state pytree, leaves [capacity, ...]
    policy: jax.Array  # f32 [capacity, A]
    value: jax.Array  # f32 [capacity]
    position: jax.Array  # i32 scalar, next write slot
    size: jax.Array  # i32 scalar, valid entries

    @property
    def capacity(self) -> int:
        return self.policy.shape[0]


def create(env, capacity: int, num_actions: int) -> ReplayBuffer:
    proto = env.init()

    def alloc(x):
        return jnp.zeros((capacity,) + x.shape, x.dtype)

    return ReplayBuffer(
        states=jax.tree_util.tree_map(alloc, proto),
        policy=jnp.zeros((capacity, num_actions), jnp.float32),
        value=jnp.zeros((capacity,), jnp.float32),
        position=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def add(buffer: ReplayBuffer, states, policy, value, mask) -> ReplayBuffer:
    """Append ``n`` samples (leaves [n, ...]); ``mask`` [n] selects live
    entries.  Masked-out rows are written to a scratch slot trick-free by
    scattering them onto their own position then not advancing — simpler:
    we compact via sort so valid rows land first, then ring-write only
    ``n_valid`` entries."""
    n = policy.shape[0]
    cap = buffer.capacity
    # Compact: stable-sort indices so valid entries come first.
    order = jnp.argsort(~mask)  # False (valid) sorts first
    n_valid = jnp.sum(mask).astype(jnp.int32)

    slots = (buffer.position + jnp.arange(n)) % cap
    # Invalid tail entries write to the same slots they'd occupy, but we mask
    # them by writing the *existing* content back.
    take = lambda x: x[order]
    valid_row = jnp.arange(n) < n_valid

    def scatter(dst, src):
        src = take(src)
        extra = (1,) * (src.ndim - 1)
        keep = valid_row.reshape((n,) + extra)
        current = dst[slots]
        return dst.at[slots].set(
            jnp.where(keep, src.astype(dst.dtype), current)
        )

    new_states = jax.tree_util.tree_map(
        lambda dst, src: scatter(dst, src), buffer.states, states
    )
    return ReplayBuffer(
        states=new_states,
        policy=scatter(buffer.policy, policy),
        value=scatter(buffer.value, value),
        position=(buffer.position + n_valid) % cap,
        size=jnp.minimum(buffer.size + n_valid, cap),
    )


class Batch(NamedTuple):
    obs: jax.Array  # f32 [B, C, H, W]
    policy: jax.Array  # f32 [B, A]
    value: jax.Array  # f32 [B]


@functools.lru_cache(maxsize=None)
def _dihedral_policy_perms(board_size: int, extra_actions: int = 0) -> np.ndarray:
    """[8, A] index permutation table for the 8 board symmetries, identity on
    trailing non-spatial actions (e.g. Go's pass).  sym k applied to policy
    p: p_aug[i] = p[perm[k, i]]."""
    n = board_size
    grid = np.arange(n * n).reshape(n, n)
    perms = []
    for k in range(4):
        rot = np.rot90(grid, k)
        for flip in (False, True):
            g = np.fliplr(rot) if flip else rot
            perm = np.empty(n * n, np.int32)
            # g[r, c] = original index now displayed at (r, c):
            # p_aug[r*n+c] = p[g[r, c]]
            perm = g.reshape(-1).astype(np.int32)
            perms.append(perm)
    perms = np.stack(perms)  # [8, n*n]
    if extra_actions:
        tail = np.tile(
            n * n + np.arange(extra_actions, dtype=np.int32), (8, 1)
        )
        perms = np.concatenate([perms, tail], axis=1)
    return perms


def augment(obs: jax.Array, policy: jax.Array, sym: jax.Array,
            board_size: int) -> Tuple[jax.Array, jax.Array]:
    """Apply dihedral symmetry ``sym`` in [0,8) to one (obs [C,H,W],
    policy [A]) pair.  Trailing non-spatial policy entries are fixed."""
    extra = policy.shape[-1] - board_size * board_size
    perms = jnp.asarray(_dihedral_policy_perms(board_size, extra))

    def make_branch(k):
        rot, flip = divmod(k, 2)

        def branch(o):
            o = jnp.rot90(o, rot, axes=(1, 2))
            if flip:
                o = jnp.flip(o, axis=2)
            return o

        return branch

    obs_aug = jax.lax.switch(sym, [make_branch(k) for k in range(8)], obs)
    pol_aug = policy[perms[sym]]
    return obs_aug, pol_aug


def sample(
    buffer: ReplayBuffer,
    env,
    rng: jax.Array,
    batch_size: int,
    augment_symmetries: bool = True,
) -> Batch:
    """Uniform sample with observation regeneration + random dihedral
    augmentation.  Jittable (env, batch_size static)."""
    idx_rng, sym_rng = jax.random.split(rng)
    idx = jax.random.randint(
        idx_rng, (batch_size,), 0, jnp.maximum(buffer.size, 1)
    )
    states = jax.tree_util.tree_map(lambda x: x[idx], buffer.states)
    obs = jax.vmap(env.observation)(states)
    policy = buffer.policy[idx]
    value = buffer.value[idx]
    if augment_symmetries:
        syms = jax.random.randint(sym_rng, (batch_size,), 0, 8)
        obs, policy = jax.vmap(
            lambda o, p, s: augment(o, p, s, env.board_size)
        )(obs, policy, syms)
    return Batch(obs=obs, policy=policy, value=value)

"""Uniform-policy stub evaluator.

The universal NN test double, mirroring the reference
``RandomPolicyNetwork`` (``include/alphazero/nn/random_policy_network.h:17-80``):
uniform policy over legal moves (achieved by zero logits + the search's
legal-masked softmax) and a small deterministic pseudo-random value derived
from the observation, so search tests are reproducible without a model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_eval_fn(obs: jax.Array, to_play=None):
    """(obs [B, C, H, W]) -> zero logits over H*W... callers needing a
    different action count should use make_uniform_eval_fn."""
    B = obs.shape[0]
    A = obs.shape[-1] * obs.shape[-2]
    return jnp.zeros((B, A), jnp.float32), jnp.zeros((B,), jnp.float32)


def make_uniform_eval_fn(num_actions: int, value_noise: float = 0.0):
    def eval_fn(obs, to_play=None):
        B = obs.shape[0]
        logits = jnp.zeros((B, num_actions), jnp.float32)
        if value_noise > 0.0:
            # Deterministic content-derived "random" value in
            # [-value_noise, value_noise], like RandomPolicyNetwork's small
            # random value but reproducible from the position alone.
            h = jnp.sum(obs.reshape(B, -1) * 0.12345, axis=-1)
            value = value_noise * jnp.sin(h * 12.9898)
        else:
            value = jnp.zeros((B,), jnp.float32)
        return logits, value

    return eval_fn

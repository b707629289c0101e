"""Learner: optimizer, train state, sharded train step.

TPU-native counterpart of the reference training loop
(``python/alphazero/training/train.py:274-330,377-536``): AlphaZero loss
(loss.py twin), Adam(+weight decay as the reference's L2), LR schedules, and
a data-parallel train step whose gradient all-reduce XLA derives from
sharding annotations (replicated params x data-sharded batch) — the
TPU replacement for the reference's single-GPU DataLoader epoch loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from alphazero_tpu.training import schedulers
from alphazero_tpu.training.loss import alphazero_loss
from alphazero_tpu.training.replay import Batch


@dataclasses.dataclass(frozen=True)
class LearnerConfig:
    learning_rate: float = 1e-3  # reference train.py default Adam lr
    weight_decay: float = 1e-4  # reference l2_reg
    scheduler: str = "warmup_cosine"
    warmup_steps: int = 500
    total_steps: int = 100_000
    grad_clip_norm: float = 5.0
    policy_weight: float = 1.0
    value_weight: float = 1.0
    optimizer: str = "adamw"  # "adamw" | "sgd"
    momentum: float = 0.9


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(config: LearnerConfig) -> optax.GradientTransformation:
    schedule = schedulers.make(
        config.scheduler,
        config.learning_rate,
        config.total_steps,
        config.warmup_steps,
    )
    if config.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.sgd(schedule, momentum=config.momentum),
        )
    else:
        opt = optax.adamw(schedule, weight_decay=config.weight_decay)
    if config.grad_clip_norm and config.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(config.grad_clip_norm), opt)
    return opt


def create_train_state(model, rng, obs_shape, config: LearnerConfig,
                       params=None) -> Tuple[TrainState, optax.GradientTransformation]:
    """``params`` throughout the train state is the FULL flax variables dict
    ({'params': ..., 'batch_stats': ...} for BatchNorm models) — the same
    object the actor's inference ``model.apply`` takes."""
    if params is None:
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
        params = model.init(rng, dummy)
    tx = make_optimizer(config)
    return (
        TrainState(
            params=params,
            opt_state=tx.init(params["params"]),
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


class TrainMetrics(NamedTuple):
    loss: jax.Array
    policy_loss: jax.Array
    value_loss: jax.Array
    grad_norm: jax.Array


def train_step(
    state: TrainState,
    batch: Batch,
    model,
    tx: optax.GradientTransformation,
    config: LearnerConfig,
) -> Tuple[TrainState, TrainMetrics]:
    """One SGD step.  Pure; jit with params replicated and batch sharded on
    the mesh data axis — XLA inserts the gradient all-reduce."""

    variables = dict(state.params)
    aux_cols = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        # BatchNorm models run in train mode with mutable running stats
        # (reference train loop runs model.train(); train.py:274-330).
        logits_value, new_model_state = model.apply(
            {"params": p, **aux_cols}, batch.obs, train=True,
            mutable=["batch_stats"],
        )
        logits, value = logits_value
        out = alphazero_loss(
            logits, value, batch.policy, batch.value,
            config.policy_weight, config.value_weight,
        )
        return out.total, (out, new_model_state)

    (_, (loss_out, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables["params"])
    updates, opt_state = tx.update(grads, state.opt_state,
                                   variables["params"])
    new_inner = optax.apply_updates(variables["params"], updates)
    params = {"params": new_inner, **aux_cols, **dict(new_model_state)}
    gnorm = optax.global_norm(grads)
    return (
        TrainState(params=params, opt_state=opt_state, step=state.step + 1),
        TrainMetrics(
            loss=loss_out.total,
            policy_loss=loss_out.policy_loss,
            value_loss=loss_out.value_loss,
            grad_norm=gnorm,
        ),
    )

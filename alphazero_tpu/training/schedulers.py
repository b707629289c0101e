"""LR schedules.

Reference: ``python/alphazero/training/scheduler.py`` — warmup-cosine,
linear-warmup, cyclic-cosine.  Implemented as optax schedules (step -> lr).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  final_lr_frac: float = 0.0):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * final_lr_frac,
    )


def linear_warmup(base_lr: float, warmup_steps: int):
    def schedule(step):
        frac = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        return base_lr * frac

    return schedule


def cyclic_cosine(base_lr: float, cycle_steps: int, min_lr_frac: float = 0.01):
    def schedule(step):
        t = (step % cycle_steps) / max(cycle_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        lo = base_lr * min_lr_frac
        return lo + (base_lr - lo) * cos

    return schedule


def step_decay(base_lr: float, step_size: int, gamma: float = 0.1):
    """torch.optim.lr_scheduler.StepLR analog (train.py's "step" option)."""

    def schedule(step):
        return base_lr * jnp.power(gamma, step // step_size)

    return schedule


def make(name: str, base_lr: float, total_steps: int, warmup_steps: int = 0,
         **kw):
    if name in ("warmup_cosine", "cosine"):
        return warmup_cosine(base_lr, warmup_steps, total_steps, **kw)
    if name == "linear_warmup":
        return linear_warmup(base_lr, warmup_steps)
    if name == "cyclic_cosine":
        return cyclic_cosine(base_lr, kw.get("cycle_steps", total_steps // 4 or 1))
    if name == "step":
        return step_decay(base_lr, kw.get("step_size", total_steps // 3 or 1),
                          kw.get("gamma", 0.1))
    if name == "constant":
        return lambda step: base_lr
    raise ValueError(f"unknown scheduler {name!r}")

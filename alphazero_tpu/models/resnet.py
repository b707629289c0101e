"""SE-ResNet policy/value network.

The flagship net: same capability envelope as the reference's canonical
model family (``python/alphazero/models/ddw_randwire.py:9-235`` — SEBlock,
ResidualBlock, policy head 1x1-conv-32 -> FC, value head 1x1-conv-32 -> FC256
-> tanh) but with a TPU-shaped trunk: NHWC layout, bf16 compute / f32 params
(the MXU's native mix), GroupNorm instead of BatchNorm so self-play inference
and training are the same pure function (no running stats to thread through a
jitted actor loop).  The random-wire DAG variant lives in
``alphazero_tpu/models/randwire.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    num_blocks: int = 6
    channels: int = 64
    se_ratio: int = 4  # reference SEBlock reduction (ddw_randwire.py:9-26)
    policy_channels: int = 32  # reference policy head width
    value_channels: int = 32
    value_hidden: int = 256  # reference value head FC width
    norm: str = "group"  # "group" | "none"
    group_size: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel attention (reference SEBlock,
    ddw_randwire.py:9-26)."""

    channels: int
    ratio: int
    dtype: Any

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        squeezed = jnp.mean(x, axis=(1, 2))  # [B, C]
        h = nn.Dense(self.channels // self.ratio, dtype=self.dtype)(squeezed)
        h = nn.relu(h)
        h = nn.Dense(self.channels, dtype=self.dtype)(h)
        gate = nn.sigmoid(h)[:, None, None, :]
        return x * gate


class ResBlock(nn.Module):
    """3x3 conv x2 + SE + residual (reference ResidualBlock,
    ddw_randwire.py:27-45)."""

    cfg: ResNetConfig

    def norm(self):
        if self.cfg.norm == "group":
            return nn.GroupNorm(
                num_groups=max(1, self.cfg.channels // self.cfg.group_size),
                dtype=self.cfg.dtype,
            )
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        c = self.cfg.channels
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)(x)
        h = self.norm()(h)
        h = nn.relu(h)
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)(h)
        h = self.norm()(h)
        h = SEBlock(c, self.cfg.se_ratio, self.cfg.dtype)(h)
        return nn.relu(x + h)


class AZResNet(nn.Module):
    """Policy/value trunk.  Input is NCHW planes (the env observation
    convention, matching the reference tensor layout) — transposed once to
    NHWC internally for TPU conv efficiency."""

    num_actions: int
    cfg: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        x = jnp.transpose(obs.astype(cfg.dtype), (0, 2, 3, 1))  # NCHW->NHWC
        x = nn.Conv(cfg.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        if cfg.norm == "group":
            x = nn.GroupNorm(
                num_groups=max(1, cfg.channels // cfg.group_size),
                dtype=cfg.dtype,
            )(x)
        x = nn.relu(x)
        for _ in range(cfg.num_blocks):
            x = ResBlock(cfg)(x)

        # Policy head (reference: 1x1 conv 32ch + FC to action size).
        p = nn.Conv(cfg.policy_channels, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)(x)
        p = nn.relu(p)
        p = p.reshape((p.shape[0], -1))
        logits = nn.Dense(self.num_actions, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          kernel_init=nn.initializers.zeros)(p)

        # Value head (reference: 1x1 conv 32ch + FC256 + tanh).
        v = nn.Conv(cfg.value_channels, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)(x)
        v = nn.relu(v)
        v = v.reshape((v.shape[0], -1))
        v = nn.Dense(cfg.value_hidden, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(v)
        v = nn.relu(v)
        # Zero-init final layers: with Adam, a fan-in-scaled init saturates
        # the tanh within tens of steps (grad ~ 0, value stuck at +-1).
        v = nn.Dense(1, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     kernel_init=nn.initializers.zeros)(v)
        value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)
        return logits.astype(jnp.float32), value


def make_eval_fn(model: nn.Module, params):
    """Close params over the model into the MCTS EvalFn signature."""

    def eval_fn(obs, to_play=None):
        return model.apply(params, obs)

    return eval_fn


def init_params(model: nn.Module, rng: jax.Array, obs_shape, batch: int = 1):
    dummy = jnp.zeros((batch,) + tuple(obs_shape), jnp.float32)
    return model.init(rng, dummy)

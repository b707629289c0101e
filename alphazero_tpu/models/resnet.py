"""SE-ResNet policy/value network.

The flagship net: same capability envelope as the reference's canonical
model family (``python/alphazero/models/ddw_randwire.py:9-235`` — SEBlock,
ResidualBlock, policy head 1x1-conv-32 -> FC, value head 1x1-conv-32 -> FC256
-> tanh) with a TPU-shaped trunk: NHWC layout, bf16 compute / f32 params
(the MXU's native mix).

Normalization follows the reference's BatchNorm (``ddw_randwire.py:27-45``):
training threads a ``batch_stats`` collection, and for inference the BN
affine folds into the conv weights (``fold_batch_norm``) so the self-play
eval path is pure convs + bias — no normalization work at all on the hot
path.  ``norm="group"`` remains available (single pure function for train
and inference, no running stats) and ``norm="none"`` is the folded-inference
form.  The random-wire DAG variant lives in
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
    norm: str = "batch"  # "batch" (reference BN) | "group" | "none"
    group_size: int = 32
    bn_momentum: float = 0.9
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


def _make_norm(cfg: ResNetConfig, train: bool):
    """Norm layer factory; returns a callable applied post-conv."""
    if cfg.norm == "batch":
        def apply(x):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=cfg.bn_momentum,
                dtype=jnp.float32,  # stats/affine in f32; folds away anyway
            )(x).astype(cfg.dtype)

        return apply
    if cfg.norm == "group":
        def apply(x):
            return nn.GroupNorm(
                num_groups=max(1, cfg.channels // cfg.group_size),
                dtype=cfg.dtype,
            )(x)

        return apply
    return lambda x: x


class ResBlock(nn.Module):
    """3x3 conv x2 + SE + residual (reference ResidualBlock,
    ddw_randwire.py:27-45)."""

    cfg: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        c = cfg.channels
        norm = _make_norm(cfg, train)
        use_bias = cfg.norm == "none"  # folded-BN form carries the bias
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=use_bias,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        h = norm(h)
        h = nn.relu(h)
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=use_bias,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)
        h = norm(h)
        h = SEBlock(c, cfg.se_ratio, cfg.dtype)(h)
        return nn.relu(x + h)


class AZResNet(nn.Module):
    """Policy/value trunk.  Input is NCHW planes (the env observation
    convention, matching the reference tensor layout) — transposed once to
    NHWC internally for TPU conv efficiency."""

    num_actions: int
    cfg: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, obs, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        norm = _make_norm(cfg, train)
        use_bias = cfg.norm == "none"
        x = jnp.transpose(obs.astype(cfg.dtype), (0, 2, 3, 1))  # NCHW->NHWC
        x = nn.Conv(cfg.channels, (3, 3), padding="SAME", use_bias=use_bias,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        x = norm(x)
        x = nn.relu(x)
        for _ in range(cfg.num_blocks):
            x = ResBlock(cfg)(x, train=train)

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


def fold_batch_norm(model: AZResNet, variables):
    """Fold a trained (or initialized) ``norm="batch"`` model's BN layers
    into the conv weights, returning ``(inference_model, inference_vars)``
    with ``norm="none"`` — the TPU inference form: the BN affine
    (gamma/sqrt(var+eps) scale + beta-mean*scale shift) becomes a conv
    kernel scale + bias, exactly as the reference's deployment-time BN
    freezing would.  y = BN(conv(x)) == conv'(x) + b' with
    W' = W * s[out], b' = beta - mean * s, s = gamma / sqrt(var + eps)."""
    from flax.core import unfreeze

    cfg = model.cfg
    if cfg.norm != "batch":
        raise ValueError("fold_batch_norm needs a norm='batch' model")
    params = unfreeze(variables["params"])
    stats = unfreeze(variables.get("batch_stats", {}))
    eps = 1e-5  # flax nn.BatchNorm default

    def fold_into(scope_params, scope_stats, conv_name, bn_name):
        bn_p = scope_params.pop(bn_name)
        bn_s = scope_stats[bn_name]
        s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        b = bn_p["bias"] - bn_s["mean"] * s
        conv = dict(scope_params[conv_name])
        conv["kernel"] = conv["kernel"] * s  # HWIO: scale out-channels
        conv["bias"] = b.astype(conv["kernel"].dtype)
        scope_params[conv_name] = conv

    top = params  # unfreeze gave us a private mutable copy
    fold_into(top, stats, "Conv_0", "BatchNorm_0")
    for i in range(cfg.num_blocks):
        blk = dict(top[f"ResBlock_{i}"])
        blk_stats = stats[f"ResBlock_{i}"]
        fold_into(blk, blk_stats, "Conv_0", "BatchNorm_0")
        fold_into(blk, blk_stats, "Conv_1", "BatchNorm_1")
        top[f"ResBlock_{i}"] = blk

    folded_cfg = dataclasses.replace(cfg, norm="none")
    folded_model = AZResNet(num_actions=model.num_actions, cfg=folded_cfg)
    return folded_model, {"params": top}


def make_eval_fn(model: nn.Module, params):
    """Close params over the model into the MCTS EvalFn signature."""

    def eval_fn(obs, to_play=None):
        return model.apply(params, obs)

    return eval_fn


def make_inference_eval_fn(model: nn.Module, variables):
    """Like ``make_eval_fn`` but BN-folds first when applicable — the
    self-play/deployment fast path."""
    cfg = getattr(model, "cfg", None)
    if cfg is not None and getattr(cfg, "norm", None) == "batch":
        model, variables = fold_batch_norm(model, variables)
    return make_eval_fn(model, variables)


def init_params(model: nn.Module, rng: jax.Array, obs_shape, batch: int = 1):
    dummy = jnp.zeros((batch,) + tuple(obs_shape), jnp.float32)
    return model.init(rng, dummy)

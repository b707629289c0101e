"""Model artifact I/O: save/load params + model config as one deployable
bundle.

Plays the role of the reference's export/convert/package scripts
(``python/scripts/export_model.py``, ``simple_export.py``,
``convert_model.py``, ``package_model.py``): where the reference exports
TorchScript for the C++ engine, the TPU framework's deployable artifact IS
the (msgpack params, JSON model-config) pair — the engine is the same jitted
program everywhere, so no tracing/conversion step exists.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import serialization


def _model_config_dict(kind: str, num_actions: int, cfg) -> Dict:
    d = dataclasses.asdict(cfg)
    for k, v in list(d.items()):
        if isinstance(v, type) or hasattr(v, "dtype") or v is jnp.bfloat16:
            d[k] = str(v)
    d.pop("dtype", None)
    d.pop("param_dtype", None)
    return {"kind": kind, "num_actions": num_actions, "config": d}


def save_model(path: str, params, kind: str, num_actions: int, cfg) -> None:
    """Write ``path`` (msgpack) + ``path + '.json'`` (model config)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(path + ".json", "w") as f:
        json.dump(_model_config_dict(kind, num_actions, cfg), f, indent=2)


def build_model(kind: str, num_actions: int, config: Dict):
    if kind == "resnet":
        from alphazero_tpu.models.resnet import AZResNet, ResNetConfig

        cfg = ResNetConfig(**config)
        return AZResNet(num_actions=num_actions, cfg=cfg), cfg
    if kind == "randwire":
        from alphazero_tpu.models.randwire import (
            DDWRandWireResNet, RandWireConfig,
        )

        cfg = RandWireConfig(**config)
        return DDWRandWireResNet(num_actions=num_actions, cfg=cfg), cfg
    raise ValueError(f"unknown model kind {kind!r}")


def load_model(path: str, obs_shape) -> Tuple[Any, Any]:
    """Returns (model, params) from a saved bundle."""
    with open(path + ".json") as f:
        meta = json.load(f)
    model, _ = build_model(meta["kind"], meta["num_actions"], meta["config"])
    template = model.init(
        jax.random.key(0), jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
    )
    with open(path, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return model, params

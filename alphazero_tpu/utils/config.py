"""Config system: one nested-dataclass tree, JSON (de)serialization,
per-game defaults.

The reference's config story is ad-hoc structs + argparse + empty JSON stubs
nothing loads (``config/{defaults,mcts,nn,self_play}/*.json``; SURVEY.md §5).
Here the dataclass tree (PipelineConfig and its members) is the single
source of truth, serializable with runs.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Type


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {
            f.name: to_dict(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)
        }
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, type) or str(type(cfg)).startswith("<class 'jax"):
        return str(cfg)
    return cfg


def from_dict(cls: Type, d: Dict) -> Any:
    """Rebuild a (possibly nested) frozen dataclass from a dict, using field
    types to recurse."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, str) and v.startswith("<class"):
            # Stringified dtype/class from to_dict — keep the field default.
            continue
        t = f.type if isinstance(f.type, type) else None
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else (f.default_factory()
                  if f.default_factory is not dataclasses.MISSING else None)
        )
        if dataclasses.is_dataclass(default) and isinstance(v, dict):
            kwargs[f.name] = from_dict(type(default), v)
        elif isinstance(default, tuple) and isinstance(v, list):
            kwargs[f.name] = tuple(
                tuple(x) if isinstance(x, list) else x for x in v
            )
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def load_config(cls: Type, path: str) -> Any:
    with open(path) as f:
        return from_dict(cls, json.load(f))


def default_pipeline_config(game: str, board_size: int | None = None):
    """Working per-game defaults (the reference's config/defaults/*.json are
    empty stubs; these are real)."""
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.resnet import ResNetConfig
    from alphazero_tpu.selfplay.actor import SelfPlayConfig
    from alphazero_tpu.training.learner import LearnerConfig
    from alphazero_tpu.training.pipeline import PipelineConfig

    if game == "gomoku":
        n = board_size or 15
        return PipelineConfig(
            game="gomoku", board_size=n,
            model=ResNetConfig(num_blocks=6, channels=64),
            selfplay=SelfPlayConfig(
                mcts=MCTSConfig(num_simulations=800, dirichlet_alpha=0.15),
                max_moves=n * n + 1, temperature_drop_move=30,
            ),
            learner=LearnerConfig(),
        )
    if game == "go":
        n = board_size or 9
        return PipelineConfig(
            game="go", board_size=n,
            model=ResNetConfig(num_blocks=8, channels=96),
            selfplay=SelfPlayConfig(
                mcts=MCTSConfig(num_simulations=800, dirichlet_alpha=0.1),
                max_moves=2 * n * n, temperature_drop_move=20,
            ),
            learner=LearnerConfig(),
        )
    if game == "chess":
        return PipelineConfig(
            game="chess", board_size=8,
            model=ResNetConfig(num_blocks=10, channels=128),
            selfplay=SelfPlayConfig(
                mcts=MCTSConfig(num_simulations=800, dirichlet_alpha=0.3),
                max_moves=512, temperature_drop_move=30,
            ),
            learner=LearnerConfig(),
        )
    raise ValueError(f"unknown game {game!r}")

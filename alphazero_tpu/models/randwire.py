"""DDW-RandWireResNet: randomly-wired policy/value network.

Parity target: the reference's canonical model
(``python/alphazero/models/ddw_randwire.py:56-235`` and its LibTorch twin
``include/alphazero/nn/ddw_randwire_resnet.h:119-328``): a stem conv
followed by ``num_blocks`` RandWire blocks — each a Watts-Strogatz
small-world digraph over SE-residual nodes with a RouterModule (1x1-conv
concat merge) and topological execution — then the standard policy/value
heads.  Per-block seeding for reproducibility mirrors ``ddw_randwire.py:172``.

TPU notes: the wiring is generated host-side at construction and baked into
the module as static structure, so the whole graph jits into one XLA
program; node execution order is a fixed topological sort (no dynamic
control flow).
"""
from __future__ import annotations

import dataclasses
import random
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from alphazero_tpu.models.resnet import SEBlock


def watts_strogatz_dag(num_nodes: int, k: int, p: float, seed: int
                       ) -> List[Tuple[int, int]]:
    """Watts-Strogatz ring graph, rewired, then oriented low->high index
    (a DAG).  Mirrors the reference's DiGraph generation
    (ddw_randwire_resnet.h:119-213)."""
    rng = random.Random(seed)
    edges = set()
    for i in range(num_nodes):
        for j in range(1, k // 2 + 1):
            edges.add(tuple(sorted((i, (i + j) % num_nodes))))
    rewired = set()
    for (u, v) in sorted(edges):
        if rng.random() < p:
            w = rng.randrange(num_nodes)
            tries = 0
            while (w == u or tuple(sorted((u, w))) in edges
                   or tuple(sorted((u, w))) in rewired) and tries < 16:
                w = rng.randrange(num_nodes)
                tries += 1
            if w != u:
                rewired.add(tuple(sorted((u, w))))
                continue
        rewired.add((u, v))
    dag = sorted({(min(u, v), max(u, v)) for (u, v) in rewired if u != v})
    return dag


@dataclasses.dataclass(frozen=True)
class RandWireConfig:
    num_blocks: int = 4  # reference default 20; scaled for board nets
    nodes_per_block: int = 8  # reference default 32
    ws_k: int = 4
    ws_p: float = 0.75
    channels: int = 64
    se_ratio: int = 4
    policy_channels: int = 32
    value_channels: int = 32
    value_hidden: int = 256
    seed: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


class _Node(nn.Module):
    """SE-residual node (reference ResidualBlock + SEBlock,
    ddw_randwire.py:9-45)."""

    cfg: RandWireConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg.channels
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)(x)
        h = nn.GroupNorm(num_groups=max(1, c // 32), dtype=self.cfg.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)(h)
        h = nn.GroupNorm(num_groups=max(1, c // 32), dtype=self.cfg.dtype)(h)
        h = SEBlock(c, self.cfg.se_ratio, self.cfg.dtype)(h)
        return nn.relu(x + h)


class _Router(nn.Module):
    """RouterModule: concat inputs -> 1x1 conv merge (ddw_randwire.py:46-55)."""

    cfg: RandWireConfig

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        if len(inputs) == 1:
            return inputs[0]
        x = jnp.concatenate(inputs, axis=-1)
        return nn.Conv(self.cfg.channels, (1, 1), use_bias=False,
                       dtype=self.cfg.dtype,
                       param_dtype=self.cfg.param_dtype)(x)


class RandWireBlock(nn.Module):
    """One random-wire block: topo-order execution of SE-res nodes over a
    WS DAG (ddw_randwire.py:56-157)."""

    cfg: RandWireConfig
    block_index: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        n = cfg.nodes_per_block
        edges = watts_strogatz_dag(
            n, cfg.ws_k, cfg.ws_p, seed=cfg.seed * 1000 + self.block_index
        )
        preds: Dict[int, List[int]] = {i: [] for i in range(n)}
        for u, v in edges:
            preds[v].append(u)
        outs: Dict[int, jax.Array] = {}
        has_succ = {u for u, _ in edges}
        for i in range(n):
            ins = [outs[j] for j in preds[i]] or [x]
            merged = _Router(cfg, name=f"router_{i}")(ins)
            outs[i] = _Node(cfg, name=f"node_{i}")(merged)
        sinks = [outs[i] for i in range(n) if i not in has_succ] or [
            outs[n - 1]
        ]
        merged = sum(sinks) / len(sinks)
        return merged


class DDWRandWireResNet(nn.Module):
    """Full model: stem -> blocks -> policy/value heads
    (ddw_randwire.py:158-235).  NCHW input like all env observations."""

    num_actions: int
    cfg: RandWireConfig = RandWireConfig()

    @nn.compact
    def __call__(self, obs, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        # ``train`` accepted for train-step API parity (GroupNorm trunk: the
        # same pure function in both modes).
        cfg = self.cfg
        x = jnp.transpose(obs.astype(cfg.dtype), (0, 2, 3, 1))
        x = nn.Conv(cfg.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        x = nn.GroupNorm(num_groups=max(1, cfg.channels // 32),
                         dtype=cfg.dtype)(x)
        x = nn.relu(x)
        for b in range(cfg.num_blocks):
            x = RandWireBlock(cfg, block_index=b, name=f"block_{b}")(x)

        p = nn.Conv(cfg.policy_channels, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)(x)
        p = nn.relu(p).reshape((p.shape[0], -1))
        logits = nn.Dense(self.num_actions, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          kernel_init=nn.initializers.zeros)(p)

        v = nn.Conv(cfg.value_channels, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)(x)
        v = nn.relu(v).reshape((v.shape[0], -1))
        v = nn.Dense(cfg.value_hidden, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(v)
        v = nn.relu(v)
        # Zero-init final layers: with Adam, a fan-in-scaled init saturates
        # the tanh within tens of steps (grad ~ 0, value stuck at +-1).
        v = nn.Dense(1, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     kernel_init=nn.initializers.zeros)(v)
        value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)
        return logits.astype(jnp.float32), value

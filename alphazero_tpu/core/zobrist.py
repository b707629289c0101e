"""Zobrist hashing as device-constant tables.

TPU-native counterpart of the reference ``ZobristHash``
(``include/alphazero/core/zobrist_hash.h:21-140``,
``src/core/zobrist_hash.cpp``): per-(piece,position) and per-player 64-bit
random keys from a seeded generator.  JAX disables 64-bit ints by default, so
keys are a ``uint32`` pair (shape ``[..., 2]``) xor-combined lane-wise — still
64 bits of hash material, and a pair of 32-bit xors vectorizes on the VPU.

Tables are generated host-side once with a fixed seed (deterministic across
processes — required for multi-host SPMD where every host must agree on
hashes) and closed over as jit constants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SEED = 20240512


@functools.lru_cache(maxsize=None)
def _host_table(shape: tuple, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**32, size=shape + (2,), dtype=np.uint64).astype(
        np.uint32
    )


class ZobristTable:
    """Keys for a game with ``num_pieces`` piece kinds over ``num_positions``
    cells, plus per-player keys and ``num_features`` named feature keys
    (ko point, castling rights, ... — mirroring ``zobrist_hash.h:addFeature``).
    """

    def __init__(
        self,
        num_pieces: int,
        num_positions: int,
        num_features: int = 0,
        feature_cardinality: int = 64,
        seed: int = DEFAULT_SEED,
    ):
        # Host numpy constants — converted to device constants per trace so
        # nothing traced is ever cached on the table object.
        self._piece = _host_table((num_pieces, num_positions), seed)
        self._player = _host_table((2,), seed + 1)
        self._feature = _host_table(
            (max(num_features, 1), feature_cardinality), seed + 2
        )

    @property
    def piece(self) -> jax.Array:  # [P, S, 2] uint32
        return jnp.asarray(self._piece)

    @property
    def player(self) -> jax.Array:  # [2, 2] uint32
        return jnp.asarray(self._player)

    def piece_key(self, piece: jax.Array, pos: jax.Array) -> jax.Array:
        return jnp.asarray(self._piece)[piece, pos]

    def player_key(self, player: jax.Array) -> jax.Array:
        return jnp.asarray(self._player)[player]

    def feature_key(self, feature: int, value: jax.Array) -> jax.Array:
        return jnp.asarray(self._feature)[feature, value]


def empty_hash() -> jax.Array:
    return jnp.zeros((2,), dtype=jnp.uint32)


def hxor(*keys: jax.Array) -> jax.Array:
    """XOR-combine uint32-pair keys."""
    out = keys[0]
    for k in keys[1:]:
        out = jnp.bitwise_xor(out, k)
    return out


def board_hash(table: ZobristTable, board: jax.Array, to_play: jax.Array) -> jax.Array:
    """Full-board hash: board is int [S] with -1/empty-sentinel meaning empty
    and values in [0, P) meaning piece kinds.  O(P*S) xor-reduction — used for
    from-scratch hashing (tests, superko ring rebuild); gameplay updates hashes
    incrementally via ``hxor`` of the affected keys.
    """
    S = board.shape[0]
    pos = jnp.arange(S)
    # [S, 2] keys of the occupying piece (or 0 when empty).
    occupied = board >= 0
    keys = table.piece[jnp.clip(board, 0), pos]  # [S, 2]
    keys = jnp.where(occupied[:, None], keys, 0)
    h = jax.lax.reduce(
        keys, np.uint32(0), jax.lax.bitwise_xor, dimensions=(0,)
    )
    return hxor(h, table.player_key(to_play))

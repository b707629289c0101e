"""Game records: host-side JSON serialization of finished games.

Keeps the reference ``GameRecord``/``MoveData`` JSON schema
(``include/alphazero/selfplay/game_record.h:21-122``,
``src/selfplay/game_record.cpp``) so records interoperate with reference
tooling: fields ``game_type, board_size, use_variant_rules,
moves[{action, policy[], value, thinking_time_ms}], result, timestamp``.

One deliberate fix vs the reference (SURVEY.md §2.5 quirk): stored policies
are always full-action-space visit distributions (zeros on illegal moves),
not children-indexed vectors.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional

import numpy as np

from alphazero_tpu.core.types import GameResult, GameType


@dataclasses.dataclass
class MoveData:
    action: int
    policy: List[float]
    value: float
    thinking_time_ms: int = 0

    def to_json(self):
        return {
            "action": int(self.action),
            "policy": [float(p) for p in self.policy],
            "value": float(self.value),
            "thinking_time_ms": int(self.thinking_time_ms),
        }

    @classmethod
    def from_json(cls, d):
        return cls(
            action=int(d["action"]),
            policy=[float(p) for p in d.get("policy", [])],
            value=float(d.get("value", 0.0)),
            thinking_time_ms=int(d.get("thinking_time_ms", 0)),
        )


@dataclasses.dataclass
class GameRecord:
    game_type: GameType
    board_size: int
    use_variant_rules: bool = False
    moves: List[MoveData] = dataclasses.field(default_factory=list)
    result: GameResult = GameResult.ONGOING
    timestamp: Optional[str] = None

    def add_move(self, action, policy, value, thinking_time_ms=0):
        self.moves.append(
            MoveData(int(action), list(np.asarray(policy, dtype=float)),
                     float(value), int(thinking_time_ms))
        )

    def set_result(self, result: GameResult):
        self.result = GameResult(result)

    def to_json(self) -> dict:
        return {
            "game_type": int(self.game_type),
            "board_size": int(self.board_size),
            "use_variant_rules": bool(self.use_variant_rules),
            "moves": [m.to_json() for m in self.moves],
            "result": int(self.result),
            "timestamp": self.timestamp
            or time.strftime("%Y-%m-%dT%H:%M:%S"),
        }

    @classmethod
    def from_json(cls, d: dict) -> "GameRecord":
        rec = cls(
            game_type=GameType(d["game_type"]),
            board_size=int(d["board_size"]),
            use_variant_rules=bool(d.get("use_variant_rules", False)),
            result=GameResult(d.get("result", 0)),
            timestamp=d.get("timestamp"),
        )
        rec.moves = [MoveData.from_json(m) for m in d.get("moves", [])]
        return rec

    def to_json_bytes(self) -> bytes:
        """Serialized record; uses the native C++ encoder when available
        (alphazero_tpu/native — the reference's C++ game_record.cpp role)."""
        from alphazero_tpu.native import get_azrecord

        mod = get_azrecord()
        if mod is not None and self.moves:
            actions = np.asarray([m.action for m in self.moves], np.int32)
            policies = np.ascontiguousarray(
                [m.policy for m in self.moves], np.float32
            )
            values = np.asarray([m.value for m in self.moves], np.float32)
            think = np.asarray(
                [m.thinking_time_ms for m in self.moves], np.int32
            )
            return mod.encode_game(
                int(self.game_type), int(self.board_size),
                bool(self.use_variant_rules), actions, policies, values,
                think, int(self.result),
                self.timestamp or time.strftime("%Y-%m-%dT%H:%M:%S"),
            )
        return json.dumps(self.to_json()).encode()

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(self.to_json_bytes())

    @classmethod
    def load(cls, path: str) -> "GameRecord":
        with open(path) as f:
            return cls.from_json(json.load(f))


def records_from_selfplay(env, output, max_games: Optional[int] = None,
                          use_variant_rules: bool = False,
                          think_ms=None) -> List[GameRecord]:
    """Convert a device SelfPlayOutput (selfplay/actor.py) into host
    GameRecords.  Policies/values come straight from the recorded arrays;
    result from the final winner.  ``think_ms`` is an optional [T] array of
    per-move host wall times (the lockstep batch computes move t for every
    game at once, so the per-game thinking time IS the batch move time —
    reference MoveData.thinking_time_ms, game_record.h:21-122)."""
    actions = np.asarray(output.actions)  # [T, B]
    policies = np.asarray(output.policies)
    values = np.asarray(output.root_values)
    active = np.asarray(output.active)
    winner = np.asarray(output.winner)
    T, B = actions.shape
    n_games = B if max_games is None else min(B, max_games)
    tms = (np.zeros(T, np.int32) if think_ms is None
           else np.asarray(think_ms, np.int32))

    records = []
    for b in range(n_games):
        rec = GameRecord(
            game_type=env.game_type,
            board_size=env.board_size,
            use_variant_rules=use_variant_rules,
        )
        for t in range(T):
            if not active[t, b]:
                break
            rec.add_move(actions[t, b], policies[t, b], values[t, b],
                         thinking_time_ms=tms[t])
        if winner[b] == 0:
            rec.set_result(GameResult.WIN_PLAYER1)
        elif winner[b] == 1:
            rec.set_result(GameResult.WIN_PLAYER2)
        else:
            rec.set_result(GameResult.DRAW)
        records.append(rec)
    return records


def records_to_training_arrays(env, records: List[GameRecord]):
    """Replay saved GameRecords through the env to regenerate states — the
    reference ``Dataset::extractExamples`` path
    (``src/selfplay/dataset.cpp:64-114``: each record is replayed through a
    fresh state; the value target is the final result from the side to
    move, :86-97).

    Returns ``(states, policy, z, mask)`` with leading dims [T, G]: the
    pre-move env-state pytree, full-action-space policy targets, +-1/0
    value targets, and a validity mask.  Records whose stored policy is not
    full-action-space (the reference's children-indexed quirk, SURVEY §2.5)
    fall back to a one-hot of the played action."""
    import jax
    import jax.numpy as jnp

    G = len(records)
    if G == 0:
        raise ValueError("no records to ingest")
    lens = [len(r.moves) for r in records]
    T = max(lens)
    A = env.num_actions

    actions = np.zeros((T, G), np.int32)
    policies = np.zeros((T, G, A), np.float32)
    winner = np.full((G,), -1, np.int32)
    for g, rec in enumerate(records):
        if rec.result == GameResult.WIN_PLAYER1:
            winner[g] = 0
        elif rec.result == GameResult.WIN_PLAYER2:
            winner[g] = 1
        for t, m in enumerate(rec.moves):
            actions[t, g] = m.action
            pol = np.asarray(m.policy, np.float32)
            if pol.shape[0] == A and pol.sum() > 0:
                policies[t, g] = pol / pol.sum()
            else:
                policies[t, g, m.action] = 1.0

    step = jax.jit(jax.vmap(env.step))
    to_play_fn = jax.jit(jax.vmap(env.to_play))
    states = jax.vmap(lambda _: env.init())(jnp.arange(G))
    per_move_states = []
    to_play = []
    for t in range(T):
        per_move_states.append(states)
        to_play.append(to_play_fn(states))
        states = step(states, jnp.asarray(actions[t]))

    states_t = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_move_states
    )
    tp = jnp.stack(to_play)  # [T, G]
    w = jnp.asarray(winner)[None, :]
    z = jnp.where(w < 0, 0.0, jnp.where(w == tp, 1.0, -1.0)).astype(
        jnp.float32
    )
    mask = jnp.asarray(
        np.arange(T)[:, None] < np.asarray(lens)[None, :]
    )
    return states_t, jnp.asarray(policies), z, mask


def load_records_dir(games_dir: str) -> List[GameRecord]:
    """Load every ``*.json`` GameRecord in a directory (reference
    ``GameRecord::loadFromFile`` over a games dir, train.py:246)."""
    import glob

    paths = sorted(glob.glob(os.path.join(games_dir, "*.json")))
    return [GameRecord.load(p) for p in paths]

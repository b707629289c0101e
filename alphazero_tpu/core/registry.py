"""Game registry + factory.

TPU-native counterpart of the reference ``GameRegistry`` singleton /
``GameFactory`` / ``createGameState`` (``include/alphazero/core/registry.h:28-111``,
``src/core/game_factory.cpp:17-120``).  Environments are static config
dataclasses (jit constants), so the registry maps names/types to constructor
callables; ``variant_args`` plays the role of the reference ``VariantArgs``
typed kv-store (``include/alphazero/core/variant_args.h:20``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

from alphazero_tpu.core.types import GameType

_REGISTRY: Dict[str, Callable[..., Any]] = {}
_BY_TYPE: Dict[GameType, str] = {}


def register_game(name: str, game_type: GameType, factory: Callable[..., Any]):
    if name in _REGISTRY:
        raise ValueError(f"game {name!r} already registered")
    _REGISTRY[name] = factory
    _BY_TYPE.setdefault(game_type, name)


def registered_games():
    return sorted(_REGISTRY)


def game_type_of(name: str) -> GameType:
    """GameType for a registered game name (UNKNOWN for plugins that
    registered without a builtin type)."""
    _ensure_builtins()
    for gt, n in _BY_TYPE.items():
        if n == str(name).lower():
            return gt
    return GameType.UNKNOWN


def create_game(name_or_type, board_size: int | None = None, **variant_args):
    """Create an environment by name ("gomoku"/"go"/"chess") or GameType.

    Mirrors ``core::createGameState(type, boardSize, variantRules)``
    (``src/core/game_factory.cpp:90-120``).
    """
    _ensure_builtins()
    if isinstance(name_or_type, GameType):
        name = _BY_TYPE[name_or_type]
    else:
        name = str(name_or_type).lower()
    if name not in _REGISTRY:
        raise KeyError(f"unknown game {name!r}; known: {registered_games()}")
    kwargs = dict(variant_args)
    if board_size is not None:
        kwargs["board_size"] = board_size
    return _REGISTRY[name](**kwargs)


_BUILTINS_LOADED = False


def _ensure_builtins():
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True
    from alphazero_tpu.games import gomoku

    if "gomoku" not in _REGISTRY:
        register_game("gomoku", GameType.GOMOKU, gomoku.GomokuEnv)
    try:
        from alphazero_tpu.games import go

        if "go" not in _REGISTRY:
            register_game("go", GameType.GO, go.GoEnv)
    except ImportError:
        pass
    try:
        from alphazero_tpu.games import chess

        if "chess" not in _REGISTRY:
            register_game("chess", GameType.CHESS, chess.ChessEnv)
    except ImportError:
        pass

"""alphazero_tpu — a TPU-native AlphaZero multi-game framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
C++/LibTorch engine (cosmosapjw-quantum/alphazero-multi-game): Gomoku
(Renju/Omok variants), Chess (+Chess960), and Go (ko/superko, area/territory
scoring) as pure vectorized environments; batched array-arena MCTS; SE-ResNet
and DDW-RandWire policy/value networks; on-device self-play -> replay ->
learner loop sharded over a TPU mesh; evaluation/ELO; CLI/REST surfaces.
"""

__version__ = "0.1.0"

from alphazero_tpu.core.types import GameType, GameResult  # noqa: F401
from alphazero_tpu.core.registry import create_game, register_game  # noqa: F401

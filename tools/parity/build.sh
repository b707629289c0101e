#!/usr/bin/env bash
# Build the reference-engine parity dump binary.
#
# The reference does not compile as checked in (bit-rotted: GameType
# ZobristHash ctor call with no matching overload, an uncaptured lambda
# variable in parallel_mcts.cpp:1581, and an unconditional spdlog include),
# so this script copies the needed subset to a scratch dir, applies the
# minimal mechanical fixes, shims spdlog with no-ops, and compiles with
# -DLIBTORCH_OFF (TorchNeuralNetwork becomes the uniform-policy/value-0
# evaluator, src/nn/torch_neural_network.cpp:202-221).  /root/reference is
# never modified.
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/parity_build}
HERE=$(cd "$(dirname "$0")" && pwd)
rm -rf "$OUT"
mkdir -p "$OUT/src" "$OUT/shim/spdlog"

cp -r "$REF/include" "$OUT/include"
for f in \
  core/zobrist_hash.cpp core/registry.cpp \
  core/game_factory.cpp \
  games/gomoku/gomoku_state.cpp games/gomoku/gomoku_rules.cpp \
  mcts/mcts_node.cpp mcts/parallel_mcts.cpp mcts/transposition_table.cpp \
  mcts/thread_pool.cpp \
  nn/neural_network.cpp nn/torch_neural_network.cpp \
  nn/random_policy_network.cpp nn/batch_queue.cpp; do
  mkdir -p "$OUT/src/$(dirname "$f")"
  cp "$REF/src/$f" "$OUT/src/$f"
done

# --- patch 1: ZobristHash(GameType, boardSize, numPieceTypes) overload ---
sed -i 's|ZobristHash(int boardSize, int numPieceTypes, int numPlayers, unsigned seed = 0);|ZobristHash(int boardSize, int numPieceTypes, int numPlayers, unsigned seed = 0);\n    ZobristHash(GameType gt, int boardSize, int numPieceTypes, unsigned seed = 0);|' \
  "$OUT/include/alphazero/core/zobrist_hash.h"
cat >> "$OUT/src/core/zobrist_hash.cpp" <<'EOF'

// Build fix: the game states construct ZobristHash(GameType, boardSize,
// numPieceTypes) but no such overload exists in the checked-in header.
namespace alphazero { namespace core {
ZobristHash::ZobristHash(GameType, int boardSize, int numPieceTypes,
                         unsigned seed)
    : ZobristHash(boardSize, numPieceTypes, 2, seed) {}
}}
EOF

# --- patch 2: uncaptured lambda variable in parallel_mcts.cpp:1557 ---
sed -i 's|\[this, i, \&completedSimulations\] {|[this, i, \&completedSimulations, numThreads] {|' \
  "$OUT/src/mcts/parallel_mcts.cpp"

# --- patch 3: public root accessor for the dump (no public API exists) ---
sed -i 's|    std::unique_ptr<MCTSNode> rootNode_;|public:\n    std::unique_ptr<MCTSNode> rootNode_;\nprivate:|' \
  "$OUT/include/alphazero/mcts/parallel_mcts.h"

# --- patch 4: missing fwd-decl of DDWRandWireResNet in the header ---
sed -i '0,/^namespace nn {/s//namespace nn {\nclass DDWRandWireResNet;/' \
  "$OUT/include/alphazero/nn/torch_neural_network.h"

# --- patch 5: missing includes (bit-rot) ---
sed -i '1i #include <mutex>\n#include <shared_mutex>' "$OUT/src/core/registry.cpp"
sed -i 's|#include "alphazero/nn/torch_neural_network.h"|#include "alphazero/nn/torch_neural_network.h"\n#include "alphazero/core/game_factory.h"|' \
  "$OUT/src/nn/torch_neural_network.cpp"

# --- patch 6: self-deadlock in search()'s root expansion ---
# search() holds rootNode_->expansionMutex and then calls
# expandNodeWithPolicy, which locks the same non-recursive mutex.  Drop the
# outer lock (expandNodeWithPolicy's own lock + double-check suffices).
python3 - "$OUT/src/mcts/parallel_mcts.cpp" <<'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
needle = """void ParallelMCTS::expandNodeWithPolicy(MCTSNode* node, const core::IGameState& state, const std::vector<float>& policy) {
    // Lock to prevent multiple threads from expanding the same node
    std::lock_guard<std::mutex> lock(node->expansionMutex);"""
fixed = """void ParallelMCTS::expandNodeWithPolicy(MCTSNode* node, const core::IGameState& state, const std::vector<float>& policy) {
    // (parity build) inner lock removed: every caller (search() root expand,
    // runSingleSimulation's TT and eval branches) already holds
    // node->expansionMutex, and std::mutex is non-recursive -> the
    // checked-in code self-deadlocks on first use.
    """
assert needle in src, "expandNodeWithPolicy lock pattern not found"
open(p, "w").write(src.replace(needle, fixed))
PYEOF

# --- shim: spdlog no-ops ---
cat > "$OUT/shim/spdlog/spdlog.h" <<'EOF'
// Minimal spdlog shim for the parity build: all logging is a no-op.
#pragma once
namespace spdlog {
template <typename... A> inline void info(A&&...) {}
template <typename... A> inline void warn(A&&...) {}
template <typename... A> inline void error(A&&...) {}
template <typename... A> inline void debug(A&&...) {}
template <typename... A> inline void critical(A&&...) {}
}  // namespace spdlog
EOF

g++ -O2 -std=c++17 -DLIBTORCH_OFF -pthread \
  -I"$OUT" -I"$OUT/include" -I"$OUT/shim" \
  "$HERE/parity_dump.cpp" \
  "$OUT"/src/core/*.cpp "$OUT"/src/games/gomoku/*.cpp \
  "$OUT"/src/mcts/*.cpp "$OUT"/src/nn/*.cpp \
  -o "$OUT/parity_dump"
echo "built $OUT/parity_dump"

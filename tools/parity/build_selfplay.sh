#!/usr/bin/env bash
# Build the reference engine's SELFPLAY binary (selfplay_main.cpp) for the
# measured-baseline run (VERDICT r3 #2): the parity-patched reference with
# the LibTorch-off uniform evaluator, on this host's CPU, printing moves/sec
# (src/selfplay/selfplay_main.cpp:128-154).
#
# Reuses build.sh's scratch prep (mechanical bit-rot fixes, spdlog shim,
# -DLIBTORCH_OFF), then adds the selfplay subsystem.  nlohmann/json is not
# available in this image, so game_record.cpp is replaced by a minimal
# hand-rolled implementation of the same API (writer only — enough for
# setSaveGames; loadFromFile throws).  /root/reference is never modified.
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/parity_build}
HERE=$(cd "$(dirname "$0")" && pwd)

# Scratch prep (idempotent: build.sh rm -rf's $OUT).
bash "$HERE/build.sh"

mkdir -p "$OUT/src/selfplay"
cp "$REF/src/selfplay/self_play_manager.cpp" "$OUT/src/selfplay/"
cp "$REF/src/selfplay/selfplay_main.cpp" "$OUT/src/selfplay/"

# Gomoku registers with the factory via a static-initializer plugin file
# (REGISTER_GAME); without it createGameState throws "Failed to create
# game: gomoku".  Its bare #includes expect per-directory -I paths.
cp "$REF/src/core/gomoku_state_plugin.cpp" "$OUT/src/core/"
sed -i 's|#include "gomoku_state.h"|#include "alphazero/games/gomoku/gomoku_state.h"|; s|#include "game_registration.h"|#include "alphazero/core/game_registration.h"|' \
  "$OUT/src/core/gomoku_state_plugin.cpp"

# --- bit-rot: self_play_manager.cpp calls core::createGameState without
# including its header (same class of fix as build.sh patch 5).
sed -i 's|#include "alphazero/mcts/transposition_table.h"|#include "alphazero/mcts/transposition_table.h"\n#include "alphazero/core/game_factory.h"|' \
  "$OUT/src/selfplay/self_play_manager.cpp"

# --- reference bug: BatchQueue use-after-free -----------------------------
# processingLoop stores reference_wrappers to the Request's cloned state
# (batch_queue.cpp:242) then requestQueue_.pop() DESTROYS the Request (and
# the clone) before processBatch reads it — ASan: heap-use-after-free in
# RandomPolicyNetwork::generateRandomPolicy, crashes every run on this
# host.  Minimal ownership fix: move the Request into the batch so the
# clone outlives inference.
python3 - "$OUT" <<'PYEOF'
import sys, re
out = sys.argv[1]

hdr = f"{out}/include/alphazero/nn/batch_queue.h"
src_h = open(hdr).read()
needle_h = """        std::vector<std::chrono::steady_clock::time_point> enqueueTimes;
    };"""
fixed_h = """        std::vector<std::chrono::steady_clock::time_point> enqueueTimes;
        // (parity build) keep the Requests alive until processBatch is
        // done: states holds reference_wrappers into them.
        std::vector<std::unique_ptr<Request>> owned;
    };"""
assert needle_h in src_h, "StateBatch pattern not found"
open(hdr, "w").write(src_h.replace(needle_h, fixed_h))

cpp = f"{out}/src/nn/batch_queue.cpp"
src_c = open(cpp).read()
needle_c = re.compile(
    r"auto& topRequest = requestQueue_\.top\(\);.*?requestQueue_\.pop\(\);",
    re.S,
)
fixed_c = """// (parity build) move the Request OUT of the queue
                    // before pop() destroys it: batch.states holds a
                    // reference into the Request's cloned state.
                    auto ownedRequest = std::move(
                        const_cast<std::unique_ptr<Request>&>(
                            requestQueue_.top()));
                    requestQueue_.pop();
                    batch.states.push_back(*ownedRequest->state);
                    batch.promises.push_back(
                        std::move(ownedRequest->promise));
                    batch.enqueueTimes.push_back(ownedRequest->enqueueTime);
                    batch.owned.push_back(std::move(ownedRequest));"""
src_c2, n = needle_c.subn(fixed_c, src_c, count=1)
assert n == 1, "processingLoop fill pattern not found"
open(cpp, "w").write(src_c2)
print("batch_queue UAF patch applied")
PYEOF

# --- minimal GameRecord/MoveData impl (no nlohmann) -----------------------
cat > "$OUT/src/selfplay/game_record.cpp" <<'EOF'
// Parity-build replacement for src/selfplay/game_record.cpp: the original
// needs nlohmann/json (absent in this image).  Same API, hand-rolled JSON
// writer compatible with the reference schema; parsing is unsupported
// (the baseline run only generates games).
#include "alphazero/types.h"
#include "alphazero/selfplay/game_record.h"
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <ctime>

namespace alphazero {
namespace selfplay {

static void appendPolicy(std::ostringstream& os,
                         const std::vector<float>& policy) {
    os << "[";
    for (size_t i = 0; i < policy.size(); ++i) {
        if (i) os << ",";
        os << policy[i];
    }
    os << "]";
}

std::string MoveData::toJson() const {
    std::ostringstream os;
    os << "{\"action\":" << action << ",\"policy\":";
    appendPolicy(os, policy);
    os << ",\"value\":" << value
       << ",\"thinking_time_ms\":" << thinking_time_ms << "}";
    return os.str();
}

MoveData MoveData::fromJson(const std::string&) {
    throw std::runtime_error("parity build: MoveData::fromJson unsupported");
}

GameRecord::GameRecord(core::GameType gameType, int boardSize,
                       bool useVariantRules)
    : gameType_(gameType), boardSize_(boardSize),
      useVariantRules_(useVariantRules),
      result_(core::GameResult::ONGOING) {}

void GameRecord::addMove(int action, const std::vector<float>& policy,
                         float value, int64_t thinkingTimeMs) {
    moves_.push_back(MoveData{action, policy, value, thinkingTimeMs});
}

void GameRecord::setResult(core::GameResult result) { result_ = result; }

std::tuple<core::GameType, int, bool> GameRecord::getMetadata() const {
    return {gameType_, boardSize_, useVariantRules_};
}

const std::vector<MoveData>& GameRecord::getMoves() const { return moves_; }

core::GameResult GameRecord::getResult() const { return result_; }

std::string GameRecord::toJson() const {
    std::ostringstream os;
    os << "{\"game_type\":" << static_cast<int>(gameType_)
       << ",\"board_size\":" << boardSize_
       << ",\"use_variant_rules\":" << (useVariantRules_ ? "true" : "false")
       << ",\"moves\":[";
    for (size_t i = 0; i < moves_.size(); ++i) {
        if (i) os << ",";
        os << moves_[i].toJson();
    }
    char ts[32];
    std::time_t t = std::time(nullptr);
    std::strftime(ts, sizeof(ts), "%Y-%m-%dT%H:%M:%S", std::localtime(&t));
    os << "],\"result\":" << static_cast<int>(result_)
       << ",\"timestamp\":\"" << ts << "\"}";
    return os.str();
}

GameRecord GameRecord::fromJson(const std::string&) {
    throw std::runtime_error("parity build: GameRecord::fromJson unsupported");
}

bool GameRecord::saveToFile(const std::string& filename) const {
    std::ofstream f(filename);
    if (!f) return false;
    f << toJson();
    return static_cast<bool>(f);
}

GameRecord GameRecord::loadFromFile(const std::string&) {
    throw std::runtime_error(
        "parity build: GameRecord::loadFromFile unsupported");
}

}  // namespace selfplay
}  // namespace alphazero
EOF

g++ -O2 -std=c++17 -DLIBTORCH_OFF -pthread \
  -I"$OUT" -I"$OUT/include" -I"$OUT/shim" \
  "$OUT"/src/selfplay/*.cpp \
  "$OUT"/src/core/*.cpp "$OUT"/src/games/gomoku/*.cpp \
  "$OUT"/src/mcts/*.cpp "$OUT"/src/nn/*.cpp \
  -o "$OUT/selfplay"
echo "built $OUT/selfplay"

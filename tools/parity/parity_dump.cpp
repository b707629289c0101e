// Fixed-seed parity dump: run the REFERENCE engine's serial deterministic
// search (uniform LibTorch-off evaluator) and print per-position root visit
// counts as JSON.
//
// Build (tools/parity/build.sh): compiles the reference's gomoku + MCTS +
// core sources with -DLIBTORCH_OFF (TorchNeuralNetwork becomes the
// uniform-policy/value-0 stub, src/nn/torch_neural_network.cpp:202-221) —
// no LibTorch, no fmt/spdlog needed by this subset.
//
// Output: one JSON object per line:
//   {"position": [moves...], "sims": N, "visits": [a0...aA-1],
//    "chosen": argmax}
//
// The companion pytest (tests/test_parity_reference.py) replays the same
// positions through alphazero_tpu's search in parity mode and compares.
#include <cstdio>
#include <memory>
#include <string>
#include <vector>

#include "alphazero/core/igamestate.h"
#include "alphazero/games/gomoku/gomoku_state.h"
// NB: the build script patches the copied parallel_mcts.h to make rootNode_
// publicly readable (no public per-action visit accessor exists; the public
// getActionProbabilities is children-indexed — the SURVEY §2.5 quirk).
#include "alphazero/mcts/parallel_mcts.h"
#include "alphazero/nn/torch_neural_network.h"

using alphazero::gomoku::GomokuState;
using alphazero::mcts::MCTSConfig;
using alphazero::mcts::ParallelMCTS;

static void dump_position(const std::vector<int>& moves, int sims,
                          int board_size) {
  auto state = std::make_unique<GomokuState>(board_size, /*use_renju=*/false,
                                             /*use_omok=*/false, /*seed=*/0,
                                             /*use_pro_long_opening=*/false);
  for (int m : moves) state->makeMove(m);

  // Uniform stub evaluator (LIBTORCH_OFF predict path).
  alphazero::nn::TorchNeuralNetwork nn("", state->getGameType(), board_size,
                                       false);

  MCTSConfig config;
  config.numThreads = 1;
  config.numSimulations = sims;
  config.cPuct = 1.5f;
  config.useDirichletNoise = false;
  config.searchMode = alphazero::mcts::MCTSSearchMode::SERIAL;
  config.useBatchedMCTS = false;
  config.useBatchInference = false;

  ParallelMCTS mcts(*state, config, &nn, nullptr);
  mcts.setDeterministicMode(true);
  mcts.search();

  const int A = state->getActionSpaceSize();
  std::vector<long> visits(A, 0);
  const auto* root = mcts.rootNode_.get();
  for (size_t i = 0; i < root->actions.size(); ++i) {
    int a = root->actions[i];
    if (a >= 0 && a < A) {
      visits[a] = root->children[i]->visitCount.load();
    }
  }
  int chosen = mcts.selectAction(false, 0.0f);

  std::string out = "{\"position\": [";
  for (size_t i = 0; i < moves.size(); ++i) {
    if (i) out += ",";
    out += std::to_string(moves[i]);
  }
  out += "], \"sims\": " + std::to_string(sims) + ", \"visits\": [";
  for (int a = 0; a < A; ++a) {
    if (a) out += ",";
    out += std::to_string(visits[a]);
  }
  out += "], \"chosen\": " + std::to_string(chosen) + "}";
  std::printf("%s\n", out.c_str());
  std::fflush(stdout);
}

int main() {
  const int N = 15;
  auto rc = [N](int r, int c) { return r * N + c; };

  // Empty board, three sim budgets (800 = the bench configuration).
  dump_position({}, 100, N);
  dump_position({}, 400, N);
  dump_position({}, 800, N);

  // 2-ply opening.
  dump_position({rc(7, 7), rc(8, 8)}, 150, N);

  // 6-ply midgame line around the center.
  std::vector<int> mid = {rc(7, 7), rc(7, 8), rc(8, 8),
                          rc(6, 6), rc(8, 7), rc(8, 6)};
  dump_position(mid, 200, N);

  // 4-ply line (different stone pattern).
  std::vector<int> line4 = {rc(7, 7), rc(6, 7), rc(7, 8), rc(6, 8)};
  dump_position(line4, 300, N);

  // 8-ply scattered position, deeper budget.
  std::vector<int> deep = {rc(7, 7), rc(3, 3), rc(7, 8), rc(11, 11),
                           rc(8, 7), rc(3, 11), rc(6, 8), rc(11, 3)};
  dump_position(deep, 500, N);
  return 0;
}

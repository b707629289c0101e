// Chess perft oracle over the REFERENCE engine's movegen.
//
// Used by tests/test_chess960_perft.py to cross-validate alphazero_tpu's
// branch-free chess legal-move generation on Chess960 start positions,
// where no published perft tables are bundled: the reference's
// ChessState/ChessRules/Chess960 (src/games/chess/*.cpp) serve as the
// independent oracle (two from-scratch implementations agreeing on exact
// node counts is strong evidence for both).
//
// Build: tools/parity/build_chess.sh (copies the reference chess+core
// subset to a scratch dir, applies the same mechanical bit-rot fixes as
// build.sh, compiles with g++ -O2; /root/reference is never modified).
//
// Usage:
//   chess_perft --depth D --fen "FEN"        (classical castling FEN)
//   chess_perft --depth D --960fen "FEN"     (Chess960 START-position FEN;
//       original rook files are derived from the back rank — the reference's
//       setFromFEN never sets them, and its numeric position decode,
//       Chess960::getPermutation (src/games/chess/chess960.cpp:442-553),
//       is broken as checked in: the knight-config decode can leave back-rank
//       squares unset and trips its own assert for most position numbers.
//       Position numbers therefore come from the CALLER's Scharnagl decode.)
// Output: one JSON line per position:
//   {"pos960": N, "fen": "...", "depth": D, "perft": [d1, d2, ..., dD]}
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "alphazero/games/chess/chess_state.h"

using alphazero::chess::ChessMove;
using alphazero::chess::ChessState;

static long long perft(const ChessState& state, int depth) {
  auto moves = state.generateLegalMoves();
  if (depth == 1) return (long long)moves.size();
  long long total = 0;
  for (const auto& m : moves) {
    ChessState next(state);  // copy; avoids relying on undoMove correctness
    next.makeMove(m);
    total += perft(next, depth - 1);
  }
  return total;
}

static void dump(const ChessState& root, int pos960, int depth) {
  std::printf("{\"pos960\": %d, \"fen\": \"%s\", \"depth\": %d, \"perft\": [",
              pos960, root.toFEN().c_str(), depth);
  for (int d = 1; d <= depth; ++d) {
    std::printf("%s%lld", d > 1 ? ", " : "", perft(root, d));
  }
  std::printf("]}\n");
  std::fflush(stdout);
}

// Derive original rook files from a START-position back rank: the rooks
// flanking the king on rank 1 (white's home rank, FEN row 8 = index 7).
static void set_rook_files_from_start(ChessState& st, const std::string& fen) {
  std::string rank1 = fen.substr(0, fen.find('/'));  // black's back rank
  // For a start position white mirrors black; scan the black rank.
  std::vector<char> files;
  for (char c : rank1) {
    if (c >= '1' && c <= '8') {
      for (int k = 0; k < c - '0'; ++k) files.push_back('.');
    } else {
      files.push_back(c);
    }
  }
  int king = -1;
  for (int f = 0; f < 8; ++f) {
    if (files[f] == 'k') king = f;
  }
  int qs = -1, ks = -1;
  for (int f = 0; f < king; ++f) {
    if (files[f] == 'r') qs = f;
  }
  for (int f = king + 1; f < 8; ++f) {
    if (files[f] == 'r' && ks < 0) ks = f;
  }
  st.setOriginalRookFiles(qs, ks, qs, ks);
}

static void list_moves(const ChessState& st) {
  for (const auto& m : st.generateLegalMoves()) {
    std::printf("%d->%d promo=%d\n", m.from_square, m.to_square,
                (int)m.promotion_piece);
  }
}

int main(int argc, char** argv) {
  int depth = 2;
  bool do_list = false;
  std::string fen, fen960;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--depth") && i + 1 < argc) {
      depth = std::atoi(argv[++i]);
    } else if (!std::strcmp(argv[i], "--fen") && i + 1 < argc) {
      fen = argv[++i];
    } else if (!std::strcmp(argv[i], "--960fen") && i + 1 < argc) {
      fen960 = argv[++i];
    } else if (!std::strcmp(argv[i], "--list")) {
      do_list = true;
    }
  }
  if (do_list) {
    if (!fen960.empty()) {
      ChessState st(true, fen960);
      set_rook_files_from_start(st, fen960);
      list_moves(st);
    } else if (!fen.empty()) {
      ChessState st(false, fen);
      list_moves(st);
    }
    return 0;
  }
  if (!fen.empty()) {
    ChessState st(false, fen);
    dump(st, -1, depth);
  }
  if (!fen960.empty()) {
    ChessState st(true, fen960);
    set_rook_files_from_start(st, fen960);
    dump(st, -1, depth);
  }
  return 0;
}

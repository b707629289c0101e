#!/usr/bin/env bash
# Build the reference-engine chess perft oracle (tools/parity/chess_perft.cpp).
#
# Same approach as build.sh: copy the needed reference subset to a scratch
# dir, apply minimal mechanical bit-rot fixes, compile.  /root/reference is
# never modified.
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/chess_perft_build}
HERE=$(cd "$(dirname "$0")" && pwd)
rm -rf "$OUT"
mkdir -p "$OUT/src"

cp -r "$REF/include" "$OUT/include"
for f in \
  core/zobrist_hash.cpp \
  games/chess/chess_state.cpp games/chess/chess_rules.cpp \
  games/chess/chess960.cpp; do
  mkdir -p "$OUT/src/$(dirname "$f")"
  cp "$REF/src/$f" "$OUT/src/$f"
done

# --- patch 1 (same as build.sh): ZobristHash(GameType, boardSize,
# numPieceTypes) overload used by the game states doesn't exist ---
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

# --- patch 2: chess_rules.h's inline oppositeColor() dereferences
# PieceColor::WHITE with only a forward declaration in scope; include
# chess_state.h (full enum) before chess_rules.h in its own TU ---
sed -i 's|#include "alphazero/games/chess/chess_rules.h"\n#include "alphazero/games/chess/chess_state.h"|X|' \
  "$OUT/src/games/chess/chess_rules.cpp"
python3 - "$OUT/src/games/chess/chess_rules.cpp" <<'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
a = '#include "alphazero/games/chess/chess_rules.h"'
b = '#include "alphazero/games/chess/chess_state.h"'
assert a in src and b in src
src = src.replace(a, '// (build fix) state.h first: rules.h uses PieceColor enumerators inline', 1)
src = src.replace(b, b + '\n' + a, 1)
open(p, "w").write(src)
PYEOF

# --- patch 2b: public rook-file setter (setFromFEN never derives the
# Chess960 original rook files; the perft driver sets them from the start
# back rank) ---
sed -i 's|    int white_kingside_rook_file_;|public:\n    void setOriginalRookFiles(int wq, int wk, int bq, int bk) {\n        white_queenside_rook_file_ = wq; white_kingside_rook_file_ = wk;\n        black_queenside_rook_file_ = bq; black_kingside_rook_file_ = bk;\n    }\nprivate:\n    int white_kingside_rook_file_;|' \
  "$OUT/include/alphazero/games/chess/chess_state.h"

# --- patch 3: infinite recursion makeMove -> isLegalMove ->
# moveExposesKing -> cloneWithMove -> makeMove ... (stack overflow on the
# first move attempt).  cloneWithMove applies an already-vetted (or
# deliberately pseudo-legal) move, so it must skip makeMove's legality
# re-check — restore that intent with a thread-local bypass flag ---
python3 - "$OUT/src/games/chess/chess_state.cpp" <<'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
guard = "static thread_local bool g_skip_legal_check = false;\n"
anchor = "void ChessState::makeMove(const ChessMove& move) {\n    if (!isLegalMove(move)) {"
assert anchor in src
src = src.replace(anchor,
    guard + anchor.replace("if (!isLegalMove(move))",
                           "if (!g_skip_legal_check && !isLegalMove(move))"), 1)
old_clone = """ChessState ChessState::cloneWithMove(const ChessMove& move) const {
    ChessState newState(*this);
    newState.makeMove(move);
    return newState;
}"""
new_clone = """ChessState ChessState::cloneWithMove(const ChessMove& move) const {
    ChessState newState(*this);
    g_skip_legal_check = true;  // (build fix) move is pseudo-legal by design
    newState.makeMove(move);
    g_skip_legal_check = false;
    return newState;
}"""
assert old_clone in src
src = src.replace(old_clone, new_clone, 1)
open(p, "w").write(src)
PYEOF

# --- patch 4: the reference's Chess960 castling is wrong as checked in —
# it computes king targets as kingFile±2 (real 960 rule: FIXED targets,
# king->g/c, rook->f/d; the ±2 formula even goes off-board for a b-file
# king, emitting to_square=-1 moves, observed on position 959), classifies
# castle direction by toFile>fromFile (breaks when king starts left of c),
# and detects castling in makeMove by |fileDiff|==2 (misses every 960
# castle with a different travel distance).  Rewrite those three spots to
# the real rule so the oracle is usable for 960 perft. ---
python3 - "$OUT/src/games/chess/chess_rules.cpp" "$OUT/src/games/chess/chess_state.cpp" <<'PYEOF'
import sys
rules_p, state_p = sys.argv[1], sys.argv[2]
src = open(rules_p).read()

# 4a: fixed castling targets (identical to classical squares; the classical
# path is unchanged because e+2=g and e-2=c).
old = """    int kingTargetFile = kingside ? kingFile + 2 : kingFile - 2;
    int rookTargetFile = kingside ? kingTargetFile - 1 : kingTargetFile + 1;"""
new = """    (void)kingFile;  // (build fix) real castling rule: fixed target files
    int kingTargetFile = kingside ? 6 : 2;   // g / c
    int rookTargetFile = kingside ? 5 : 3;   // f / d"""
assert old in src
src = src.replace(old, new, 1)

# 4b: drop the (broken) chess960 king-target overrides in addCastlingMoves.
old_ks = """        // In Chess960, the king's target is two files to the right of its starting position
        int targetFile = kingFile + 2;
        if (chess960_ && targetFile < 8) {
            kingTarget = getSquare(kingRank, targetFile);
        }"""
old_qs = """        // In Chess960, the king's target is two files to the left of its starting position
        int targetFile = kingFile - 2;
        if (chess960_ && targetFile >= 0) {
            kingTarget = getSquare(kingRank, targetFile);
        }"""
for blk in (old_ks, old_qs):
    if blk in src:
        src = src.replace(blk, "        // (build fix) fixed targets from getCastlingSquares", 1)

# 4c: robust side classification + full king/rook path checks.
old = """    // Determine castling direction
    bool isKingside = (toFile > fromFile);"""
new = """    // (build fix) with fixed targets the side IS the target file
    bool isKingside = (toFile == 6);"""
assert old in src
src = src.replace(old, new, 1)

old = """    // Check that the king's path is safe
    int step = isKingside ? 1 : -1;
    for (int file = fromFile; file != toFile + step; file += step) {"""
new = """    // (build fix) king path: every square from min to max of travel must
    // be unattacked and (except the castling rook) empty; handles zero- and
    // one-step 960 castles that the step loop skipped entirely.
    int lo_ = std::min(fromFile, toFile), hi_ = std::max(fromFile, toFile);
    for (int file = lo_; file <= hi_; ++file) {"""
assert old in src
src = src.replace(old, new, 1)

# 4d: rook-target emptiness (never checked in the original).
old = """    return true;
}

std::pair<int, int> ChessRules::getCastlingSquares"""
new = """    {   // (build fix) rook path: squares from rook start to rook target
        // must be empty apart from the king and the rook themselves.
        int rookTo = isKingside ? 5 : 3;
        int rlo = std::min(rookFile, rookTo), rhi = std::max(rookFile, rookTo);
        for (int file = rlo; file <= rhi; ++file) {
            int square = getSquare(fromRank, file);
            if (square == from_square || square == rookSquare) continue;
            if (!state_.getPiece(square).is_empty()) return false;
        }
    }
    return true;
}

std::pair<int, int> ChessRules::getCastlingSquares"""
assert old in src, "isValidCastle tail not found"
src = src.replace(old, new, 1)
open(rules_p, "w").write(src)

src = open(state_p).read()
# 4e: makeMove castle detection for 960 fixed targets.  NB: a normal king
# step onto file c/g while rights persist is inherently ambiguous in this
# (from,to) move encoding; callers must avoid comparing such positions.
old = "    if (piece.type == PieceType::KING && std::abs(getFile(move.from_square) - getFile(move.to_square)) == 2) {"
new = """    bool is_castle_ = piece.type == PieceType::KING &&
        std::abs(getFile(move.from_square) - getFile(move.to_square)) == 2;
    if (chess960_ && piece.type == PieceType::KING && !is_castle_) {
        int tf_ = getFile(move.to_square);
        if (tf_ == 6 || tf_ == 2) {
            bool ks_ = (tf_ == 6);
            bool right_ = (piece.color == PieceColor::WHITE)
                ? (ks_ ? castling_rights_.white_kingside
                       : castling_rights_.white_queenside)
                : (ks_ ? castling_rights_.black_kingside
                       : castling_rights_.black_queenside);
            int rf_ = getOriginalRookFile(ks_, piece.color);
            Piece r_ = getPiece(getSquare(getRank(move.from_square), rf_));
            is_castle_ = right_ && r_.type == PieceType::ROOK &&
                         r_.color == piece.color;
        }
    }
    if (is_castle_) {"""
assert old in src
src = src.replace(old, new, 1)
# side classification inside the castle block: fixed-target file, not
# travel direction (a one-step b->c queenside castle classifies as
# kingside under toFile>fromFile and moves the wrong rook).
old = "        bool isKingside = getFile(move.to_square) > getFile(move.from_square);"
new = "        bool isKingside = getFile(move.to_square) == 6;  // (build fix)"
assert src.count(old) >= 1
src = src.replace(old, new)
# rook target with fixed rule (both modes): f/d.
old = """        int rookToFile;
        if (chess960_) {
            // In Chess960, the rook goes to the other side of the king
            rookToFile = isKingside ? getFile(move.to_square) - 1 : getFile(move.to_square) + 1;
        } else {
            // In standard chess, rook goes to fixed position
            rookToFile = isKingside ? 5 : 3;
        }"""
new = """        int rookToFile = isKingside ? 5 : 3;  // (build fix) fixed rule"""
assert old in src
src = src.replace(old, new, 1)
open(state_p, "w").write(src)
PYEOF

g++ -O2 -std=c++17 \
  -I"$OUT/include" \
  "$HERE/chess_perft.cpp" \
  "$OUT"/src/core/*.cpp "$OUT"/src/games/chess/*.cpp \
  -o "$OUT/chess_perft"
echo "built $OUT/chess_perft"

"""NumPy port of the REFERENCE Renju forbidden-move chain — a test oracle.

Faithful transliteration of ``GomokuRules::is_black_renju_forbidden``
(/root/reference/src/games/gomoku/gomoku_rules.cpp:118-1224), including its
quirks (the reference's own renju test file is empty, so this port IS the
executable specification we fuzz against):

  * accessor-swap semantics: the hypothetical stone at ``action`` is visible
    during overline, double-four counting and three-pattern collection, but
    NOT during the straight-four/recursive refinement (the reference
    restores the accessor before rule 9.3 is applied);
  * three "patterns" are whole 5-cell windows (stones + empties), unified
    by >=3-cell overlap;
  * ``can_make_straight_four`` treats the LOWEST action of the pattern as a
    hypothetical black stone (``*three_pattern.begin()``);
  * the recursive 9.3(b) check has max depth 3.

Used by tests/test_renju_fuzz.py and tools/fuzz_renju.py to compare the
TPU ``forbidden_map`` implementation against the reference semantics.
"""
from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np

DIRS = ((0, 1), (1, 0), (1, 1), (-1, 1))


class RenjuOracle:
    """board: [bs, bs] int8 — 0 empty, 1 black, 2 white.  Actions are
    x * bs + y (x = first index), matching the reference accessors."""

    def __init__(self, board: np.ndarray):
        self.board = np.asarray(board)
        self.bs = self.board.shape[0]
        self.extra_black: Set[int] = set()  # accessor-swap overlay

    # -- accessors ---------------------------------------------------------
    def in_bounds(self, x, y):
        return 0 <= x < self.bs and 0 <= y < self.bs

    def a(self, x, y):
        return x * self.bs + y

    def xy(self, a):
        return divmod(a, self.bs)

    def is_set(self, p, a, extra: Set[int] = frozenset()):
        if p == 0 and (a in self.extra_black or a in extra):
            return True
        x, y = self.xy(a)
        return self.board[x, y] == p + 1

    # -- entry -------------------------------------------------------------
    def is_black_renju_forbidden(self, action: int) -> bool:
        if self.renju_is_overline(action):
            return True
        if self.renju_double_four_or_more(action):
            return True
        if not self.is_allowed_double_three(action):
            return True
        return False

    # -- overline (:140-195) ------------------------------------------------
    def renju_is_overline(self, action: int) -> bool:
        x0, y0 = self.xy(action)
        extra = {action}
        for dx, dy in DIRS:
            count = 1
            nx, ny = x0 + dx, y0 + dy
            while self.in_bounds(nx, ny) and self.is_set(
                    0, self.a(nx, ny), extra):
                count += 1
                nx += dx
                ny += dy
            nx, ny = x0 - dx, y0 - dy
            while self.in_bounds(nx, ny) and self.is_set(
                    0, self.a(nx, ny), extra):
                count += 1
                nx -= dx
                ny -= dy
            if count >= 6:
                return True
        return False

    # -- double four (:198-286) ----------------------------------------------
    def renju_double_four_or_more(self, action: int) -> bool:
        self.extra_black.add(action)  # accessor swap (:210-216)
        try:
            return self.renju_count_all_fours() >= 2
        finally:
            self.extra_black.discard(action)

    def renju_count_all_fours(self) -> int:
        found: List[Tuple[frozenset, int]] = []
        for x in range(self.bs):
            for y in range(self.bs):
                for dx, dy in DIRS:
                    line = []
                    xx, yy = x, y
                    for _ in range(7):
                        if not self.in_bounds(xx, yy):
                            break
                        line.append((xx, yy))
                        xx += dx
                        yy += dy
                    for w in (5, 6, 7):
                        if len(line) < w:
                            break
                        for s in range(len(line) - w + 1):
                            seg = line[s:s + w]
                            if self.renju_is_four_shape(seg):
                                blk = self.positions_of_black(seg)
                                if not any(
                                    len(blk & fs) >= 3 for fs, _ in found
                                ):
                                    found.append((blk, len(blk)))
        return len(found)

    def renju_is_four_shape(self, seg) -> bool:
        black = white = 0
        for x, y in seg:
            a = self.a(x, y)
            if self.is_set(1, a):
                white += 1
            elif self.is_set(0, a):
                black += 1
        if white > 0 or black < 3 or black > 4:
            return False
        front, back = self.ends_are_open(seg)
        if black == 4:
            return front or back
        return self.check_broken_four(seg, front, back)

    def ends_are_open(self, seg):
        if len(seg) < 2:
            return False, False
        (x0, y0), (x1, y1) = seg[0], seg[-1]
        dx, dy = seg[1][0] - x0, seg[1][1] - y0
        front = back = False
        fx, fy = x0 - dx, y0 - dy
        if self.in_bounds(fx, fy):
            af = self.a(fx, fy)
            if not self.is_set(0, af) and not self.is_set(1, af):
                front = True
        lx, ly = x1 + dx, y1 + dy
        if self.in_bounds(lx, ly):
            ab = self.a(lx, ly)
            if not self.is_set(0, ab) and not self.is_set(1, ab):
                back = True
        return front, back

    def check_broken_four(self, seg, front, back) -> bool:
        if not front and not back:
            return False
        empties = [
            (x, y) for x, y in seg
            if not self.is_set(0, self.a(x, y))
            and not self.is_set(1, self.a(x, y))
        ]
        if len(empties) != 1:
            return False
        gap = self.a(*empties[0])
        best = run = 0
        for x, y in seg:
            a = self.a(x, y)
            if a == gap or self.is_set(0, a):
                run += 1
                best = max(best, run)
            else:
                run = 0
        return best >= 4

    def positions_of_black(self, seg) -> frozenset:
        return frozenset(
            self.a(x, y) for x, y in seg if self.is_set(0, self.a(x, y))
        )

    # -- three patterns (:648-768) --------------------------------------------
    def get_three_patterns_for_action(self, action: int):
        """NB: runs with whatever accessor overlay is currently installed
        (the caller swaps it — is_allowed_double_three does, the recursive
        check does for its placements)."""
        patterns: List[Set[int]] = []
        x0, y0 = self.xy(action)
        for dx, dy in DIRS:
            line = []
            for off in range(-3, 4):
                nx, ny = x0 + off * dx, y0 + off * dy
                if self.in_bounds(nx, ny):
                    line.append((nx, ny))
            for s in range(0, max(0, len(line) - 4)):
                seg = line[s:s + 5]
                if self.is_three_pattern(seg, action):
                    pat = {self.a(x, y) for x, y in seg}
                    if not any(
                        len(set(e) & pat) >= 3 for e in patterns
                    ):
                        patterns.append(pat)
        return patterns

    def is_three_pattern(self, seg, action: int) -> bool:
        extra = {action}
        black = white = 0
        contains = False
        for x, y in seg:
            a = self.a(x, y)
            if self.is_set(0, a, extra):
                black += 1
                if a == action:
                    contains = True
            elif self.is_set(1, a):
                white += 1
        if black != 3 or white > 0 or not contains:
            return False
        for x, y in seg:
            a = self.a(x, y)
            if not self.is_set(0, a, extra) and not self.is_set(1, a):
                extra2 = {action, a}
                tb = sum(
                    1 for tx, ty in seg
                    if self.is_set(0, self.a(tx, ty), extra2)
                )
                if tb == 4:
                    return True
        return False

    # -- allowed double three (:952-1224) -------------------------------------
    def is_allowed_double_three(self, action: int) -> bool:
        self.extra_black.add(action)  # swap (:961-966)
        try:
            patterns = self.get_three_patterns_for_action(action)
        finally:
            self.extra_black.discard(action)  # restore (:971)
        if len(patterns) < 2:
            return True
        if self.count_straight_four_capable(patterns) <= 1:
            return True
        return self.recursive_allowed(patterns, 0, 3)

    def count_straight_four_capable(self, patterns) -> int:
        return sum(
            1 for p in patterns if self.can_make_straight_four(p)
        )

    def can_make_straight_four(self, pattern: Set[int]) -> bool:
        anchor = min(pattern)  # *three_pattern.begin() (:992)
        for placement in self.find_three_to_four_placements(pattern):
            extra = {anchor, placement}
            new_pattern = set(pattern) | {placement}
            blacks = {
                a for a in new_pattern if self.is_set(0, a, extra)
            }
            if len(blacks) != 4:
                continue
            if self.is_straight_four(new_pattern):
                return True
        return False

    def find_three_to_four_placements(self, pattern: Set[int]):
        coords = sorted(self.xy(a) for a in pattern)
        hor = all(c[1] == coords[0][1] for c in coords)
        ver = all(c[0] == coords[0][0] for c in coords)
        dn = all(
            c[0] - coords[0][0] == c[1] - coords[0][1] for c in coords
        )
        up = all(
            c[0] - coords[0][0] == coords[0][1] - c[1] for c in coords
        )
        # NB reference order: horizontal means same second coord here
        # (:1053-1056 checks .second for horizontal) — replicated.
        if hor:
            dx, dy = 0, 1
        elif ver:
            dx, dy = 1, 0
        elif dn:
            dx, dy = 1, 1
        elif up:
            dx, dy = 1, -1
        else:
            return []
        xs = [c[0] for c in coords]
        ys = [c[1] for c in coords]
        min_x, max_x = min(xs), max(xs)
        min_y, max_y = min(ys), max(ys)
        out = []
        for i in range(5):
            x, y = min_x + i * dx, min_y + i * dy
            if not self.in_bounds(x, y):
                continue
            a = self.a(x, y)
            if (not self.is_set(0, a) and not self.is_set(1, a)
                    and a not in pattern):
                out.append(a)
        for x, y in ((min_x - dx, min_y - dy), (max_x + dx, max_y + dy)):
            if self.in_bounds(x, y):
                a = self.a(x, y)
                if not self.is_set(0, a) and not self.is_set(1, a):
                    out.append(a)
        return out

    def is_straight_four(self, pattern: Set[int]) -> bool:
        seg = sorted(self.xy(a) for a in pattern)
        black = white = 0
        for x, y in seg:
            a = self.a(x, y)
            if self.is_set(0, a):
                black += 1
            elif self.is_set(1, a):
                white += 1
        if white > 0 or black != 4:
            return False
        front, back = self.ends_are_open(seg)
        return front or back

    def recursive_allowed(self, patterns, depth, max_depth) -> bool:
        if depth >= max_depth:
            return False
        if self.count_straight_four_capable(patterns) <= 1:
            return True
        for pattern in patterns:
            for placement in self.find_three_to_four_placements(pattern):
                if self.is_set(0, placement) or self.is_set(1, placement):
                    continue
                self.extra_black.add(placement)
                try:
                    new_patterns = self.get_three_patterns_for_action(
                        placement
                    )
                finally:
                    self.extra_black.discard(placement)
                if len(new_patterns) >= 2:
                    if self.recursive_allowed(
                            new_patterns, depth + 1, max_depth):
                        return True
        return False


def forbidden_mask(board: np.ndarray) -> np.ndarray:
    """Reference-semantics forbidden map over all empty cells."""
    oracle = RenjuOracle(board)
    bs = board.shape[0]
    out = np.zeros((bs, bs), bool)
    for x in range(bs):
        for y in range(bs):
            if board[x, y] == 0:
                out[x, y] = oracle.is_black_renju_forbidden(x * bs + y)
    return out

"""Fuzz the TPU Renju forbidden_map against the reference-semantics oracle.

tests/renju_oracle.py is a faithful NumPy port of the reference
``is_black_renju_forbidden`` chain (gomoku_rules.cpp:118-1224).  This sweep
generates random non-terminal mid-game boards and compares every empty
cell's verdict, categorizing divergences:

  class FIVE  — cells where placing black makes an exact five: the TPU
                implementation applies Renju rule five-precedence
                (a five is never forbidden); the reference does not check
                fives in its forbidden chain.  Deliberate divergence.
  class OTHER — anything else (must be investigated / fixed / documented).

Run: python tools/fuzz_renju.py [n_boards] [board_size] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def random_board(rng, bs, max_stones):
    """Alternate random stones; reject placements creating any 5-in-row so
    the position is non-terminal."""
    board = np.zeros((bs, bs), np.int8)
    player = 1
    stones = rng.integers(6, max_stones + 1)
    tries = 0
    placed = 0
    while placed < stones and tries < 10 * max_stones:
        tries += 1
        x, y = rng.integers(0, bs, 2)
        if board[x, y]:
            continue
        board[x, y] = player
        if has_five(board, player):
            board[x, y] = 0
            continue
        player = 3 - player
        placed += 1
    return board


def has_five(board, player):
    m = board == player
    for dx, dy in ((0, 1), (1, 0), (1, 1), (1, -1)):
        run = m.copy()
        for _ in range(4):
            run = run & np.roll(
                np.roll(m, -dx, 0), -dy, 1
            )
            # Mask wraparound.
            if dx:
                run[-dx:, :] = False
            if dy > 0:
                run[:, -dy:] = False
            elif dy < 0:
                run[:, :(-dy)] = False
            m = np.roll(np.roll(m, -dx, 0), -dy, 1)
            if dx:
                m[-dx:, :] = False
            if dy > 0:
                m[:, -dy:] = False
            elif dy < 0:
                m[:, :(-dy)] = False
        if run.any():
            return True
        m = board == player
    return False


def compare_board(env, fmap_fn, board):
    """Returns (n_cells, five_divergence, other_divergence_list)."""
    import jax.numpy as jnp

    from renju_oracle import RenjuOracle

    bs = board.shape[0]
    black = jnp.asarray(board == 1)
    white = jnp.asarray(board == 2)
    ours_forbidden, ours_five = fmap_fn(black, white)
    ours_forbidden = np.asarray(ours_forbidden)
    ours_five = np.asarray(ours_five)

    oracle = RenjuOracle(board)
    n = 0
    five_div = 0
    others = []
    for x in range(bs):
        for y in range(bs):
            if board[x, y]:
                continue
            n += 1
            a = x * bs + y
            ref = oracle.is_black_renju_forbidden(a)
            # The env's effective rule: forbidden & ~five (five precedence).
            eff = bool(ours_forbidden[x, y]) and not bool(ours_five[x, y])
            if eff == ref:
                continue
            if bool(ours_five[x, y]) and ref:
                five_div += 1  # deliberate five-precedence divergence
                continue
            # Classify by the oracle stage that decides the verdict.
            if oracle.renju_is_overline(a):
                stage = "overline"
            elif oracle.renju_double_four_or_more(a):
                # Sub-classify: does the reference's double-four involve
                # fours NOT passing through the action (its
                # renju_count_all_fours is board-global — it forbids a
                # cell because of unrelated fours elsewhere)?
                oracle.extra_black.add(a)
                thru = _fours_through_action(oracle, a)
                oracle.extra_black.discard(a)
                stage = "d4-through" if thru >= 2 else "d4-global"
            else:
                stage = "double-three"
            others.append((x, y, ref, bool(ours_forbidden[x, y]), stage))
    return n, five_div, others


def _fours_through_action(oracle, action):
    """Count the oracle's four-shapes whose black set contains ``action``
    (the standard-Renju reading: the move must CREATE the fours)."""
    found = []
    bs = oracle.bs
    for x in range(bs):
        for y in range(bs):
            for dx, dy in ((0, 1), (1, 0), (1, 1), (-1, 1)):
                line = []
                xx, yy = x, y
                for _ in range(7):
                    if not oracle.in_bounds(xx, yy):
                        break
                    line.append((xx, yy))
                    xx += dx
                    yy += dy
                for w in (5, 6, 7):
                    if len(line) < w:
                        break
                    for s in range(len(line) - w + 1):
                        seg = line[s:s + w]
                        if oracle.renju_is_four_shape(seg):
                            blk = oracle.positions_of_black(seg)
                            if action not in blk:
                                continue
                            if not any(len(blk & f) >= 3 for f in found):
                                found.append(blk)
    return len(found)


def main():
    n_boards = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from alphazero_tpu.games.gomoku import GomokuEnv

    env = GomokuEnv(board_size=bs, use_renju=True)
    fmap_fn = jax.jit(env.forbidden_map)

    rng = np.random.default_rng(seed)
    total = fives = 0
    all_others = []
    for i in range(n_boards):
        board = random_board(rng, bs, max_stones=min(2 * bs * bs // 3, 40))
        n, f, others = compare_board(env, fmap_fn, board)
        total += n
        fives += f
        if others:
            all_others.append((board.copy(), others))
        if (i + 1) % 100 == 0:
            print(f"{i+1}/{n_boards} boards, {total} cells, "
                  f"five-precedence {fives}, other {sum(len(o[1]) for o in all_others)}",
                  flush=True)

    n_other = sum(len(o[1]) for o in all_others)
    by_stage = {}
    for _, others in all_others:
        for x, y, ref, ours_f, stage in others:
            key = (stage, "ref-forbids" if ref else "ours-forbids")
            by_stage[key] = by_stage.get(key, 0) + 1
    print(f"\nDONE: {n_boards} boards, {total} cells compared")
    print(f"five-precedence divergences (deliberate): {fives}")
    print(f"OTHER divergences: {n_other}")
    for key, cnt in sorted(by_stage.items()):
        print(f"  {key}: {cnt}")
    for board, others in all_others[:3]:
        print("-" * 40)
        print(board)
        for x, y, ref, ours_f, stage in others:
            print(f"  cell ({x},{y}): ref={ref} ours={ours_f} "
                  f"stage={stage}")


if __name__ == "__main__":
    main()

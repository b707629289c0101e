"""Play Gomoku against the engine in the terminal.

The reference ships tkinter/matplotlib GUIs (python/examples/play_gomoku.py);
this is the dependency-free terminal equivalent built on the CLI session.

    python examples/play_gomoku.py [--board-size 9] [--simulations 200] \
        [--model path/to/model.msgpack]
"""
import argparse
import sys

sys.path.insert(0, ".")

from alphazero_tpu.cli import GameSession  # noqa: E402


def parse_move(text: str, n: int):
    """Accept 'H8' style or 'row col' numbers."""
    text = text.strip()
    if not text:
        return None
    if text[0].isalpha():
        col = ord(text[0].upper()) - ord("A")
        try:
            row = int(text[1:]) - 1
        except ValueError:
            return None
        if 0 <= row < n and 0 <= col < n:
            return row * n + col
        return None
    parts = text.split()
    if len(parts) == 2:
        try:
            row, col = int(parts[0]) - 1, int(parts[1]) - 1
        except ValueError:
            return None
        if 0 <= row < n and 0 <= col < n:
            return row * n + col
    return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--board-size", type=int, default=9)
    p.add_argument("--simulations", type=int, default=200)
    p.add_argument("--model", default=None)
    p.add_argument("--play-white", action="store_true",
                   help="let the engine open")
    args = p.parse_args()

    sess = GameSession("gomoku", args.board_size, args.model,
                       args.simulations)
    n = args.board_size
    print(sess.show())
    if args.play_white:
        action, info = sess.ai_move()
        print(f"engine: {chr(ord('A') + action % n)}{action // n + 1} "
              f"(v={info['value']:+.2f})")
        print(sess.show())

    while not sess.info()["terminal"]:
        move = parse_move(input("your move (e.g. H8): "), n)
        if move is None or not sess.play(move):
            print("illegal — try again")
            continue
        print(sess.show())
        if sess.info()["terminal"]:
            break
        action, info = sess.ai_move()
        print(f"engine: {chr(ord('A') + action % n)}{action // n + 1} "
              f"(v={info['value']:+.2f}, {info['time_s']}s)")
        print(sess.show())

    winner = sess.info()["winner"]
    print("game over:",
          "draw" if winner < 0 else ("black wins" if winner == 0
                                     else "white wins"))


if __name__ == "__main__":
    main()

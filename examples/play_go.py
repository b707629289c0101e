"""Play Go against the engine in the terminal (reference examples/play_go.py
analog, terminal UI instead of tkinter)."""
import argparse
import sys

sys.path.insert(0, ".")

from alphazero_tpu.cli import GameSession  # noqa: E402
from examples.play_gomoku import parse_move  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--board-size", type=int, default=9)
    p.add_argument("--simulations", type=int, default=200)
    p.add_argument("--model", default=None)
    args = p.parse_args()

    sess = GameSession("go", args.board_size, args.model, args.simulations)
    n = args.board_size
    print(sess.show())
    while not sess.info()["terminal"]:
        raw = input("your move (e.g. D4, or 'pass'): ").strip().lower()
        move = n * n if raw == "pass" else parse_move(raw, n)
        if move is None or not sess.play(move):
            print("illegal — try again")
            continue
        print(sess.show())
        if sess.info()["terminal"]:
            break
        action, info = sess.ai_move()
        print("engine:",
              "pass" if action == n * n
              else f"{chr(ord('A') + action % n)}{action // n + 1}",
              f"(v={info['value']:+.2f})")
        print(sess.show())
    print("result:", sess.info())


if __name__ == "__main__":
    main()

"""Play Chess against the engine in the terminal (reference
examples/play_chess.py analog).  Moves in coordinate form: e2e4, a7a8n
(promotion letter n/b/r; queen is default)."""
import argparse
import sys

sys.path.insert(0, ".")

from alphazero_tpu.cli import GameSession  # noqa: E402
from alphazero_tpu.games import chess_tables as T  # noqa: E402
from alphazero_tpu.games.chess_fen import square_from_alg  # noqa: E402


def parse_move(text):
    text = text.strip().lower()
    if len(text) not in (4, 5):
        return None
    try:
        frm = square_from_alg(text[:2])
        to = square_from_alg(text[2:4])
    except (ValueError, IndexError):
        return None
    promo = None
    if len(text) == 5:
        promo = {"n": T.KNIGHT, "b": T.BISHOP, "r": T.ROOK,
                 "q": None}.get(text[4], None)
        if text[4] not in "nbrq":
            return None
    try:
        return T.encode_move(frm, to, promo)
    except (ValueError, KeyError):
        return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--simulations", type=int, default=200)
    p.add_argument("--model", default=None)
    p.add_argument("--chess960", type=int, default=None)
    args = p.parse_args()

    variant = {}
    if args.chess960 is not None:
        variant["chess960_position"] = args.chess960
    sess = GameSession("chess", 8, args.model, args.simulations, **variant)
    print(sess.show())
    while not sess.info()["terminal"]:
        move = parse_move(input("your move (e.g. e2e4): "))
        if move is None or not sess.play(move):
            print("illegal — try again")
            continue
        print(sess.show())
        if sess.info()["terminal"]:
            break
        action, info = sess.ai_move()
        frm, t = divmod(action, 73)
        print(f"engine action {action} (from sq {frm}) "
              f"v={info['value']:+.2f}")
        print(sess.show())
    print("result:", sess.info())


if __name__ == "__main__":
    main()

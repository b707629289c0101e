"""Interactive CLI — the reference CLI surface
(``include/alphazero/cli/cli_interface.h:110-121``, ``src/cli/cli_main.cpp``):
commands new / play / aimove / undo / show / info / setoption / save / load /
benchmark / quit, driving the same batched engine with batch size 1.

Run:  python -m alphazero_tpu.cli [--game gomoku] [--board-size 15]
"""
from __future__ import annotations

import argparse
import json
import time


class GameSession:
    """One interactive game: env + state + history (undo) + engine."""

    def __init__(self, game="gomoku", board_size=15, model_path=None,
                 simulations=200, **variant):
        import jax

        from alphazero_tpu.core import registry
        from alphazero_tpu.mcts.search import MCTSConfig, search, select_action
        from alphazero_tpu.models.stub import make_uniform_eval_fn

        self.jax = jax
        self.game = game
        self.env = registry.create_game(game, board_size, **variant)
        self.options = {"simulations": simulations, "temperature": 0.0}
        if model_path:
            from alphazero_tpu.models.io import load_model
            from alphazero_tpu.models.resnet import make_inference_eval_fn

            model, params = load_model(model_path, self.env.observation_shape)
            # BN-folded inference path (models/resnet.fold_batch_norm).
            self.eval_fn = make_inference_eval_fn(model, params)
        else:
            self.eval_fn = make_uniform_eval_fn(
                self.env.num_actions, value_noise=0.1
            )
        self._search = search
        self._select = select_action
        self._mcts_config_cls = MCTSConfig
        self._jit_cache = {}
        self.rng = jax.random.key(int(time.time()) % 2**31)
        self.new_game()

    def new_game(self):
        self.state = self.env.init()
        self.history = [self.state]
        self.actions = []
        self._reset_engines()

    def _reset_engines(self):
        for eng in self._jit_cache.values():
            if hasattr(eng, "reset"):
                eng.reset()

    def _engine(self, sims: int):
        """Per-simulation-count search engine.  Match surfaces carry the
        tree across moves (reference updateWithMove; production decision:
        +33 +- 11 Elo at 800 sims, alphazero_tpu/production.py) — the
        session re-roots it through every played move, the engine's own
        and the human's alike (self_play_manager.cpp:205-211 semantics)."""
        key = ("engine", sims)
        if key not in self._jit_cache:
            from alphazero_tpu import production
            from alphazero_tpu.mcts.search import (
                HostReuseSearch,
                make_host_search,
            )

            cfg = self._mcts_config_cls(
                num_simulations=sims,
                dirichlet_epsilon=0.0,
                tree_reuse=production.MATCH_TREE_REUSE,
                reuse_budget=production.MATCH_REUSE_BUDGET,
                wave_size=min(16, sims),
            )
            if cfg.tree_reuse:
                eng = HostReuseSearch(self.env, self.eval_fn, cfg)
            else:
                eng = make_host_search(self.env, self.eval_fn, cfg)
            self._jit_cache[key] = eng
        return self._jit_cache[key]

    def _next_rng(self):
        self.rng, sub = self.jax.random.split(self.rng)
        return sub

    def legal_actions(self):
        import numpy as np

        return np.nonzero(np.asarray(self.env.legal_mask(self.state)))[0]

    def play(self, action: int) -> bool:
        import jax.numpy as jnp
        import jax.tree_util as jtu
        import numpy as np

        legal = np.asarray(self.env.legal_mask(self.state))
        if action < 0 or action >= len(legal) or not legal[action]:
            return False
        self.state = self.env.step(self.state, self.jax.numpy.asarray(action))
        self.history.append(self.state)
        self.actions.append(int(action))
        # Carry any kept search tree through the played move (engine's own
        # and the opponent's alike — reference updateWithMove semantics).
        batched = jtu.tree_map(lambda x: x[None], self.state)
        acts = jnp.asarray([action], jnp.int32)
        for eng in self._jit_cache.values():
            if hasattr(eng, "advance"):
                eng.advance(None, acts, batched, self._next_rng())
        return True

    def ai_move(self):
        """Run search and play the chosen action.  Returns (action, info)."""
        import jax.numpy as jnp
        import jax.tree_util as jtu

        sims = int(self.options["simulations"])
        eng = self._engine(sims)
        batched = jtu.tree_map(lambda x: x[None], self.state)
        t0 = time.perf_counter()
        out = eng(batched, self._next_rng())
        counts = out.visit_counts
        counts.block_until_ready()
        think = time.perf_counter() - t0
        temp = jnp.float32(self.options["temperature"])
        action = int(
            self._select(self._next_rng(), counts, temp)[0]
        )
        self.play(action)
        return action, {
            "value": float(out.root_value[0]),
            "visits": int(counts.sum()),
            "time_s": round(think, 2),
        }

    def cells(self):
        """Structured board for GUI clients: flat row-major list.

        gomoku/go: -1 empty, 0 black, 1 white.  chess: -1 empty, 0-5 white
        PNBRQK, 6-11 black (row 0 = rank 1).
        """
        import numpy as np

        return [int(v) for v in np.asarray(self.state.board).reshape(-1)]

    def move_from_squares(self, from_sq: int, to_sq: int, promo=None):
        """Resolve a (from, to[, promo]) chess click pair to a legal action
        index, or None.  Tries the plain encoding, then the KxR castling
        encoding (king clicked onto its own rook or two squares sideways)."""
        import numpy as np

        from alphazero_tpu.games.chess_tables import encode_move

        legal = np.asarray(self.env.legal_mask(self.state))
        promo_code = {None: None, "": None, "q": None, "n": 1, "b": 2,
                      "r": 3}.get(promo, None)
        candidates = []
        # Try the promo-plane encoding first (so an actual underpromotion
        # wins), but ALWAYS also try the plain encoding: the GUI sends its
        # promo dropdown value with every move, and a non-promotion move
        # encoded on an underpromotion plane is illegal (or unencodable).
        for code in ([promo_code, None] if promo_code is not None
                     else [None]):
            try:
                candidates.append(encode_move(int(from_sq), int(to_sq),
                                              code))
            except (ValueError, KeyError, ZeroDivisionError):
                pass
        # Castling clicked as a two-square king move: translate to the KxR
        # encoding used by the engine (king onto rook's square).
        fr, fc = divmod(int(from_sq), 8)
        tr, tc = divmod(int(to_sq), 8)
        if fr == tr and abs(fc - tc) == 2:
            rook_c = 7 if tc > fc else 0
            try:
                candidates.append(
                    encode_move(int(from_sq), fr * 8 + rook_c, None))
            except (ValueError, KeyError, ZeroDivisionError):
                pass
        for a in candidates:
            if a is not None and 0 <= a < len(legal) and legal[a]:
                return int(a)
        return None

    def undo(self) -> bool:
        if len(self.history) <= 1:
            return False
        self.history.pop()
        self.actions.pop()
        self.state = self.history[-1]
        # Kept trees are rooted below the undone move — drop them.
        self._reset_engines()
        return True

    def save_game(self, path: str):
        """Save the current game as a GameRecord JSON (reference CLI
        ``save``, include/alphazero/cli/cli_interface.h:110-121)."""
        from alphazero_tpu.core.registry import game_type_of
        from alphazero_tpu.selfplay.game_record import GameRecord

        rec = GameRecord(
            game_type=game_type_of(self.game),
            board_size=getattr(self.env, "board_size",
                               getattr(self.env, "size", 0)),
        )
        for a in self.actions:
            rec.add_move(a, [], 0.0)
        rec.set_result(int(self.env.result(self.state)))
        rec.save(path)

    def load_game(self, path: str) -> bool:
        """Load a GameRecord JSON and replay its moves into this session
        (reference CLI ``load``).  The record must be for the same game
        type; returns False on mismatch or an illegal recorded move."""
        from alphazero_tpu.core.registry import game_type_of
        from alphazero_tpu.selfplay.game_record import GameRecord

        rec = GameRecord.load(path)
        if int(rec.game_type) != int(game_type_of(self.game)):
            return False
        saved_state, saved_hist, saved_acts = (
            self.state, self.history, self.actions
        )
        self.new_game()
        for m in rec.moves:
            if not self.play(int(m.action)):
                self.state, self.history, self.actions = (
                    saved_state, saved_hist, saved_acts
                )
                return False
        return True

    def show(self) -> str:
        from alphazero_tpu.utils.render import render

        return render(self.env, self.state)

    def info(self) -> dict:
        s = self.state
        return {
            "game": self.game,
            "to_play": int(self.env.to_play(s)),
            "move_count": int(s.move_count),
            "terminal": bool(self.env.terminal_flag(s)),
            "winner": int(self.env.winner(s)),
            "legal_moves": len(self.legal_actions()),
        }


HELP = """commands:
  new                     start a new game
  play <action>           make a move (flat action index)
  aimove                  let the engine move
  undo                    undo last move
  show                    print the board
  info                    print game status as JSON
  setoption <name> <val>  set engine option (simulations, temperature)
  save <path>             save the game as a GameRecord JSON
  load <path>             load a saved game (replays its moves)
  benchmark               time one engine move
  quit                    exit
"""


def repl(session: GameSession):
    print(HELP)
    print(session.show())
    while True:
        try:
            line = input("az> ").strip()
        except EOFError:
            break
        if not line:
            continue
        cmd, *rest = line.split()
        if cmd == "quit":
            break
        elif cmd == "new":
            session.new_game()
            print(session.show())
        elif cmd == "play":
            if not rest or not session.play(int(rest[0])):
                print("illegal move")
            else:
                print(session.show())
        elif cmd == "aimove":
            action, info = session.ai_move()
            print(f"engine plays {action} ({info})")
            print(session.show())
        elif cmd == "undo":
            print("ok" if session.undo() else "nothing to undo")
        elif cmd == "show":
            print(session.show())
        elif cmd == "info":
            print(json.dumps(session.info()))
        elif cmd == "setoption" and len(rest) == 2:
            session.options[rest[0]] = float(rest[1])
            print("ok")
        elif cmd == "save" and rest:
            try:
                session.save_game(rest[0])
                print("ok")
            except OSError as e:
                print(f"save failed: {e}")
        elif cmd == "load" and rest:
            try:
                ok = session.load_game(rest[0])
            except (OSError, ValueError, KeyError) as e:
                print(f"load failed: {e}")
            else:
                print(session.show() if ok else "load failed: bad record")
        elif cmd == "benchmark":
            t0 = time.perf_counter()
            action, info = session.ai_move()
            session.undo()
            print(json.dumps({"move_time_s": round(time.perf_counter() - t0,
                                                   2), **info}))
        else:
            print(HELP)


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--game", default="gomoku",
                   choices=["gomoku", "go", "chess"])
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--model", default=None)
    p.add_argument("--simulations", type=int, default=200)
    args = p.parse_args(argv)
    session = GameSession(args.game, args.board_size, args.model,
                          args.simulations)
    repl(session)


if __name__ == "__main__":
    main()

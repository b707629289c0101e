"""Merge the round-5 flagship legs into ONE joint Bradley-Terry fit.

The scratch run (leg 1) was killed mid-rating by a wedged TPU-tunnel
connection; its matches live only in its log.  Legs 2/3 resumed from the
persisted snapshots (FLAG2_SNAP_DIR) and wrote normal
docs/train_flagship2_leg{2,3}.json payloads.  This tool:

  * parses `  match A vs B: +x -y =z` lines from leg-1's log,
  * concatenates them with the leg JSONs' match tables,
  * drops exact duplicates (each leg re-rates its start snapshot with the
    SAME deterministic seeds, and every leg merges the cached anchor
    round-robin — identical tuples are one observation, not several),
  * fits one anchored Bradley-Terry table (uniform_mcts_256 = 1500) and
    writes docs/train_flagship3.json + a combined curve plot.

Usage: python tools/merge_flagship_legs.py LOG JSON [JSON...]
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pure-host tool: never touch the (possibly busy) TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from alphazero_tpu.elo.bradley_terry import fit_bradley_terry  # noqa: E402
from alphazero_tpu.eval import anchors  # noqa: E402

MATCH_RE = re.compile(
    r"^\s*match (\S+) vs (\S+): \+(\d+) -(\d+) =(\d+)\s*$"
)


def parse_log(path: str):
    out = []
    with open(path) as f:
        for line in f:
            m = MATCH_RE.match(line)
            if m:
                a, b, wa, wb, dr = m.groups()
                out.append((a, b, int(wa), int(wb), int(dr)))
    return out


def main():
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 1
    matches = []
    sources = {}
    for p in paths:
        if p.endswith(".json"):
            with open(p) as f:
                rows = [tuple(r) for r in json.load(f)["matches"]]
        else:
            rows = parse_log(p)
        sources[os.path.basename(p)] = len(rows)
        matches.extend(rows)
    seen = set()
    unique = []
    for r in matches:
        if r not in seen:
            seen.add(r)
            unique.append(r)
    ratings = fit_bradley_terry(unique, anchor=anchors.CANONICAL,
                                anchor_rating=anchors.CANONICAL_RATING)
    payload = {
        "sources": sources,
        "n_matches_raw": len(matches),
        "n_matches_unique": len(unique),
        "matches": [list(r) for r in unique],
        "bt_ratings": {k: round(v, 1) for k, v in ratings.items()},
        "anchor": {"name": anchors.CANONICAL,
                   "rating": anchors.CANONICAL_RATING},
    }
    out = "docs/train_flagship3.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")
    print(json.dumps(dict(sorted(payload["bt_ratings"].items(),
                                 key=lambda kv: -kv[1])), indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = []
        for name, r in ratings.items():
            m = re.fullmatch(r"it_(\d+)", name)
            if m:
                pts.append((int(m.group(1)), r))
            elif name == "scratch":
                pts.append((0, r))
        pts.sort()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        fig, ax = plt.subplots(figsize=(7, 4.2))
        ax.plot(xs, ys, "o-", color="#4c72b0", label="flagship (200 eval sims)")
        for aname in anchors.POOL:
            if aname in ratings:
                ax.axhline(ratings[aname], ls="--", lw=0.8, color="#999")
                ax.annotate(f"{aname} {ratings[aname]:.0f}",
                            (xs[-1], ratings[aname]),
                            fontsize=7, va="bottom", ha="right",
                            color="#666")
        ax.set_xlabel("training iteration (256 games x 800 sims each)")
        ax.set_ylabel("anchored Bradley-Terry rating")
        ax.set_title("Round-5 flagship: three-leg cosine-restart run "
                     "(joint BT fit)")
        ax.legend(loc="lower right", fontsize=8)
        fig.tight_layout()
        fig.savefig("docs/train_flagship3_elo.png", dpi=130)
        print("wrote docs/train_flagship3_elo.png")
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

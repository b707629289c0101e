#!/usr/bin/env bash
# Measure the reference engine's throughput on this host (VERDICT r3 #2)
# and write tools/parity/reference_baseline.json for bench.py to report
# vs_reference_measured.
#
# Two measurements:
#   1. serial engine (parity_dump): the reference's SERIAL deterministic
#      search with the LibTorch-off uniform evaluator — its engine speed
#      with zero NN cost.  Robust (no threads), so this is the recorded
#      moves_per_s figure.  NOTE the asymmetry: alphazero_tpu's bench
#      number INCLUDES a real 6x64 SE-ResNet forward per simulation; this
#      reference figure pays nothing for inference.
#   2. the production selfplay binary (build_selfplay.sh) in its stock
#      BATCHED mode — for the record only: even after the parity build's
#      mechanical fixes AND an ownership fix for a use-after-free in
#      BatchQueue (ASan-verified), it reaches ~0.002-0.02 moves/s on this
#      host and dies with heap corruption ("free(): unaligned chunk")
#      within ~1 game.  Not a usable baseline; the crash signatures are
#      recorded in PARITY.md.
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-/tmp/parity_build}

[ -x "$OUT/parity_dump" ] || bash "$HERE/build.sh"

# Time the parity dump's fixed search set (7 positions, 2450 sims total,
# gomoku 15x15, single thread).  1-run vs 4-run difference removes process
# startup + evaluator construction from the estimate (generous to the
# reference).
t0=$(date +%s.%N)
"$OUT/parity_dump" > /tmp/parity_timing.json 2>/dev/null
t1=$(date +%s.%N)
for _ in 1 2 3 4; do "$OUT/parity_dump" > /tmp/parity_timing.json 2>/dev/null; done
t2=$(date +%s.%N)
python3 - "$t0" "$t1" "$t2" "$HERE/reference_baseline.json" <<'PYEOF'
import json
import sys

t0, t1, t2 = (float(a) for a in sys.argv[1:4])
out_path = sys.argv[4]
sims = 0
with open("/tmp/parity_timing.json") as f:
    for line in f:
        sims += json.loads(line)["sims"]
sims *= 3  # 4-run leg minus 1-run leg
elapsed = (t2 - t1) - (t1 - t0)
sims_per_s = sims / elapsed
moves_per_s = sims_per_s / 800.0
payload = {
    "moves_per_s": round(moves_per_s, 2),
    "method": (
        "reference SERIAL search, uniform LibTorch-off evaluator "
        "(parity_dump), single thread, gomoku 15x15; moves/s = measured "
        "sims/s / 800.  Zero NN cost -- favorable to the reference."
    ),
    "sims_total": sims,
    "elapsed_s": round(elapsed, 3),
    "sims_per_s": round(sims_per_s, 0),
    "host_cores": __import__("os").cpu_count(),
    "production_binary": (
        "stock BATCHED selfplay binary measured <=0.02 moves/s and "
        "crashes with heap corruption within ~1 game on this host "
        "(see PARITY.md)"
    ),
}
with open(out_path, "w") as f:
    json.dump(payload, f, indent=2)
print(json.dumps(payload))
PYEOF

"""Re-parse an existing /tmp/jaxtrace xplane dump: per-op-family device
time, excluding async copy-start (overlapped DMA) noise.

  python tools/parse_trace.py [trace_dir]
"""
import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
path = sorted(paths)[-1]
print("parsing", path)

xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    print(f"== plane: {plane.name} ==")
    ev_meta = plane.event_metadata
    for line in plane.lines:
        tot = sum(ev.duration_ps for ev in line.events) / 1e9
        print(f"  line '{line.name}': {len(line.events)} events, {tot:.1f} ms")
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        total = defaultdict(float)
        count = defaultdict(int)
        full = {}
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            if name.startswith("%copy-start") or name.startswith(
                    "%slice-start") or name.startswith("%copy-done") \
                    or name.startswith("%slice-done"):
                fam = "ASYNC-DMA (overlapped)"
            else:
                # strip trailing .N to group families
                fam = re.sub(r"\.\d+$", "", name.split(" = ")[0])
            total[fam] += ev.duration_ps / 1e9
            count[fam] += 1
            if fam not in full or len(full[fam]) < 10:
                full[fam] = ev_meta[ev.metadata_id].name[:180]
        rows = sorted(total.items(), key=lambda kv: -kv[1])
        sync_sum = sum(v for k, v in total.items()
                       if k != "ASYNC-DMA (overlapped)")
        print(f"sync op time: {sync_sum:.1f} ms")
        for fam, ms in rows[:40]:
            print(f"{ms:9.2f} ms x{count[fam]:6d}  {fam}")
            if fam != "ASYNC-DMA (overlapped)":
                print(f"            e.g. {full[fam]}")

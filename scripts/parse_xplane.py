"""Parse a jax.profiler xplane.pb trace: top device ops by total duration.

Usage: python scripts/parse_xplane.py /tmp/unet_trace [--families N]

Default: top ops by name on every plane. ``--families N`` (N = iters
traced) aggregates the serialized ``XLA Ops`` line of the TPU plane into
op families (module-scope prefix for custom calls, HLO op kind for the
rest) and prints per-iteration times — the per-phase roofline accounting
(BENCH_NOTES.md). Async *-start spans are EXCLUDED from family totals
(they overlap compute; their stall time shows up in the *-done events,
which are included).
"""

import glob
import re
import sys
from collections import defaultdict


def _load_planes(root):
    files = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane files under", root)
        return []
    try:  # moved in TF 2.21
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.core.profiler.protobuf import xplane_pb2

    planes = []
    for f in files:
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(f, "rb").read())
        planes.extend(space.planes)
    return planes


def families(root, iters):
    for plane in _load_planes(root):
        if "TPU" not in plane.name:
            continue
        agg = defaultdict(lambda: [0.0, 0])
        module_ms = 0.0
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms = sum(ev.duration_ps / 1e9 for ev in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = plane.event_metadata[ev.metadata_id].name
                if "-start" in nm:  # async issue; overlapped, not serialized
                    continue
                m = re.match(
                    r"%?((?:downs|ups|mid|final|init)[a-zA-Z_0-9]*_fn"
                    r"|[a-zA-Z_\-]+)",
                    nm,
                )
                key = m.group(1) if m else nm[:40]
                agg[key][0] += ev.duration_ps / 1e9
                agg[key][1] += 1
        print(
            f"=== {plane.name}: device {module_ms/iters:.3f} ms/iter "
            f"({iters} iters)"
        )
        for key, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
            if ms / iters < 0.005:
                continue
            print(f"{ms/iters:8.3f} ms/iter x{n//iters:<4} {key}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_trace"
    if "--families" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--families") + 1])
        families(root, iters)
        return
    for plane in _load_planes(root):
        total_by_name = defaultdict(float)
        count_by_name = defaultdict(int)
        for line in plane.lines:
            for event in line.events:
                meta = plane.event_metadata[event.metadata_id]
                dur_us = event.duration_ps / 1e6
                total_by_name[meta.name] += dur_us
                count_by_name[meta.name] += 1
        if not total_by_name:
            continue
        total = sum(total_by_name.values())
        print(f"\n=== plane: {plane.name} (total {total/1e3:.2f} ms across events)")
        top = sorted(total_by_name.items(), key=lambda kv: -kv[1])[:25]
        for name, us in top:
            print(f"  {us/1e3:9.3f} ms  x{count_by_name[name]:<5} {name[:110]}")


if __name__ == "__main__":
    main()

"""Parse a jax.profiler xplane.pb trace: top device ops by total duration.

Usage: python scripts/parse_xplane.py /tmp/unet_trace
"""

import glob
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_trace"
    files = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane files under", root)
        return
    from tensorflow.core.profiler.protobuf import xplane_pb2

    for f in files:
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(f, "rb").read())
        for plane in space.planes:
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

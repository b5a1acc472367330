"""Summarise a JAX profiler xplane trace into per-op device times.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/parse_xplane.py [trace.xplane.pb]

The "XLA Ops" line is the serial compute timeline (what to optimise);
async lines (DMA copy/slice-start) overlap compute and cannot be summed.
Capture traces with jax.profiler.start_trace/stop_trace (bench.py has a
BENCH_TRACE=<dir> knob).  HLO op names are collapsed to opcode + shape
prefix so per-layer instances aggregate.
"""

import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        hits = sorted(glob.glob("/tmp/jtrace*/plugins/profile/*/*.xplane.pb"))
        if not hits:
            raise SystemExit("no trace found under /tmp/jtrace*")
        path = hits[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        emeta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            span = 0.0
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                m = re.match(r"%?([a-z-]+[a-z])[_.\d]*\s*=\s*(\S{0,28})", name)
                key = f"{m.group(1)} {m.group(2)}" if m else name[:44]
                tot[key] += ev.duration_ps / 1e9
                cnt[key] += 1
                span += ev.duration_ps / 1e9
            print(f"\n== LINE '{line.name}' ({len(line.events)} events, busy {span:.2f} ms) ==")
            for name, ms in tot.most_common(30):
                print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name}")


if __name__ == "__main__":
    main()

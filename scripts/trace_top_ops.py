#!/usr/bin/env python
"""Summarise a jax.profiler xplane trace: top XLA ops by total device time.

Usage: python scripts/trace_top_ops.py /tmp/ttrace [N] [line-substr]
(pass the directory given to jax.profiler.trace / BENCH_PROFILE).
Default line filter is "XLA Ops" — the exclusive per-op device timeline;
"Async" rows (DMA prefetch wall times that OVERLAP compute) are excluded
unless you ask for them (e.g. line-substr "Async").

Requires the baked-in tensorflow's xplane proto; runs with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the native protobuf
refuses the generated code.
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ttrace"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    line_substr = sys.argv[3] if len(sys.argv) > 3 else "XLA Ops"
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    plane = max(xs.planes, key=lambda p: sum(len(l.events) for l in p.lines))
    lines = ([l for l in plane.lines if l.name == line_substr]
             or [l for l in plane.lines if line_substr in l.name]
             or list(plane.lines))
    print(f"# {paths[-1]}\n# plane: {plane.name}; "
          f"lines: {[l.name for l in lines]}")
    tot, cnt = defaultdict(float), defaultdict(int)
    emeta = plane.event_metadata
    for line in lines:
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            tot[name] += ev.duration_ps / 1e9
            cnt[name] += 1
    grand = sum(tot.values())
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"{ms:9.2f} ms x{cnt[name]:4d}  {name[:120]}")
    print(f"# total exclusive: {grand:.2f} ms over {sum(cnt.values())} events")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bucket a jax.profiler xplane trace into named op groups (markdown table).

The round-2f/round-3 perf methodology (docs/kernels.md): decompose the
on-device "XLA Ops" timeline of a traced step into semantic buckets
(matmul megafusions, flash kernels, conv fwd/bwd, normalization traffic,
GQ search, copies, ...) so slack is attributed to a component, not a
vibe.  This script automates the table.

Usage:
  python scripts/trace_buckets.py /tmp/ttrace [--rules vit|unet] \
      [--steps N] [--unmatched]

Rules are (bucket, regex) pairs applied first-match over XLA op names.
`--steps N` divides totals by N (trace captured N identical steps).
`--unmatched` prints the top unmatched op names so rules can be refined.
"""

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# First-match-wins.  Names come from the XLA Ops line: pallas kernels keep
# their `name=` (flash_blc_*, gq_topk_*), fusions are `fusion[.N]` with the
# root op's name sometimes embedded; convs are `convolution[.N]` /
# `conv_general_dilated`; `%` prefixes and `.N` suffixes vary by version.
RULES = {
    "vit": [
        ("flash fwd", r"flash_blc_(fwd_)?h\d"),
        ("flash bwd", r"flash_blc_bwd"),
        ("GQ search", r"gq_(topk|search|argmax)|gq_pallas"),
        ("LayerNorm (fused)", r"layer_norm|ln_(fwd|bwd|add)"),
        ("copies/reshapes", r"^%?(copy|bitcast|transpose|reshape)"),
        ("reduces/elementwise", r"^%?(reduce|convert|select|add|multiply|broadcast)"),
        ("matmul fusions", r"^%?(fusion|dot|custom-call)"),
    ],
    "unet": [
        ("GQ search", r"gq_(topk|search|argmax)|gq_pallas"),
        ("fused resample fwd", r"_(up|down)sample_conv"),
        ("fused resample dgrad", r"_(up|down)sample_dgrad"),
        ("fused resample wgrad", r"_(up|down)sample_wgrad"),
        ("flash", r"flash_blc"),
        # conv wgrads emit (tuples of) f32[k,k,Cin,Cout] filter grads
        ("conv wgrad fusions", r"= \(?f32\[[13],[13],\d+,\d+\]"),
        # fwd conv fusions rooted at the next GroupNorm's stats reduce
        # emit (f32[B,C] sum, f32[B,C] sumsq, bf16 activation) tuples
        ("conv+GN-stats megafusions", r"= \(f32\[\d+\]\{0|= \(f32\[\d+,\d+\]\{1,0"),
        ("plain conv fusions", r"^%?conv"),
        ("copies/reshapes", r"^%?(copy|bitcast|transpose|reshape|slice)"),
        ("other fusions (dgrad/elementwise/matmul)",
         r"^%?(fusion|dot|custom-call|reduce|convert|select|add|multiply|sub|broadcast)"),
    ],
}


def load_ops(root, line_substr="XLA Ops"):
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    plane = max(xs.planes, key=lambda p: sum(len(l.events) for l in p.lines))
    lines = ([l for l in plane.lines if l.name == line_substr]
             or [l for l in plane.lines if line_substr in l.name])
    tot, cnt = defaultdict(float), defaultdict(int)
    emeta = plane.event_metadata
    for line in lines:
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            tot[name] += ev.duration_ps / 1e9
            cnt[name] += 1
    return tot, cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--rules", default="vit", choices=sorted(RULES))
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--unmatched", action="store_true")
    args = ap.parse_args()

    tot, cnt = load_ops(args.trace)
    rules = [(b, re.compile(rx, re.I)) for b, rx in RULES[args.rules]]
    btot, bcnt = defaultdict(float), defaultdict(int)
    unmatched = defaultdict(float)
    # Trace op names carry the whole instruction text; cut at the operand
    # list (the first paren opening a typed/%-prefixed operand) so rules
    # match the defining op only — otherwise a fusion CONSUMING e.g. an
    # _upsample_conv output leaks into the resample bucket.  Layout parens
    # like T(8,128) don't match the lookahead and survive.
    # (?<=\w): the operand paren directly follows the opcode word; a
    # TUPLE shape's paren follows "= " and keeps its shape in the head
    head_cut = re.compile(
        r"(?<=\w)\((?=%|bf16|f32|f16|s32|u32|s16|u16|s8|u8|pred)")
    for name, ms in tot.items():
        stripped = head_cut.split(name.lstrip("%"), maxsplit=1)[0]
        for bucket, rx in rules:
            if rx.search(stripped):
                btot[bucket] += ms
                bcnt[bucket] += cnt[name]
                break
        else:
            btot["rest"] += ms
            bcnt["rest"] += cnt[name]
            unmatched[name] += ms

    grand = sum(btot.values())
    n = max(args.steps, 1)
    print(f"| bucket | ms/step | events/step | share |")
    print(f"|---|---|---|---|")
    for b, ms in sorted(btot.items(), key=lambda kv: -kv[1]):
        print(f"| {b} | {ms / n:.2f} | {bcnt[b] // n} | {100 * ms / grand:.1f}% |")
    print(f"\ntotal exclusive: {grand / n:.2f} ms/step "
          f"({args.steps} step(s) traced)")
    if args.unmatched and unmatched:
        print("\ntop unmatched ops (counted under 'rest'):")
        for name, ms in sorted(unmatched.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ms / n:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()

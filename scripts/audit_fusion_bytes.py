#!/usr/bin/env python
"""Bandwidth-floor audit of an optimized HLO dump: per-op-class HBM bytes.

Completes the trace-bucket methodology (scripts/trace_buckets.py): the
trace gives each bucket's measured ms; this gives the bucket's HBM byte
traffic (operands + outputs of every top-level instruction), whose
bytes / 819 GB/s is the bandwidth FLOOR.  measured ≈ floor means the
bucket is memory-bound at speed-of-light; measured >> floor means
engineering slack.

    python scripts/dump_train_hlo.py /tmp/hlo_unet   # on the TPU
    python scripts/audit_fusion_bytes.py /tmp/hlo_unet/ae.hlo.txt

Byte accounting is an upper bound for ops whose operands stay resident
in VMEM between neighbours, and ignores DMA overlap — both effects make
the true floor LOWER, so "measured ≈ floor" claims stay conservative.
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
               "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
               "s8": 1, "u8": 1, "pred": 1}

HBM_BW = 819e9  # v5e

CLASSES = [
    ("flash fwd", r"flash_blc_fwd"),
    ("flash bwd", r"flash_blc_bwd"),
    ("gq search", r"gq_"),
    ("fused resample", r"(up|down)sample"),
    ("convolution", r"^convolution|conv_general|kind=kConvolution"),
    ("reduce/convert (norm stats)", r"^(reduce|convert)|convert_reduce|reduce_fusion"),
    ("copy/transpose", r"^(copy|transpose|bitcast)"),
    ("fusion (elementwise/matmul)", r"^(fusion|dot|custom-call)"),
]


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    path = sys.argv[1]
    text = open(path).read()
    # entry computation: the block after `ENTRY %... {` until its closing
    m = re.search(r"ENTRY [^\{]*\{(.*)", text, re.S)
    body = m.group(1) if m else text
    # per-instruction: %name = <shape(s)> op-name(operand list ...).
    # Shapes may carry tiled-layout annotations (f32[8]{0:T(8,128)(2,1)S(1)})
    # and tuple shapes nest parens — the shape class admits ():  and the
    # op-name anchor requires preceding whitespace (layouts contain none).
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
        r"((?:\((?:[^()]|\([^)]*\))*\)|[\w\[\],{}():\s/*]+?))\s+"
        r"([\w\-]+)\(")
    lines = body.splitlines()
    shapes = {}
    rows = []
    for line in lines:
        m = inst_re.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        b = shape_bytes(shape)
        shapes[name] = b
        rows.append((name, op, b, line))
    # second pass: operand bytes by name reference
    op_bytes = defaultdict(float)
    op_cnt = defaultdict(int)
    class_rx = [(c, re.compile(rx, re.I)) for c, rx in CLASSES]
    # Bookkeeping ops move no HBM bytes; async copy/slice pairs move their
    # payload once (count 2x the DONE's output: one read + one write; the
    # START's tuple shape double-counts src+dst and the sync flag).
    free_ops = {"get-tuple-element", "tuple", "bitcast", "parameter",
                "constant", "copy-start", "slice-start", "after-all"}
    for name, op, out_b, line in rows:
        if op in free_ops:
            continue
        if op in ("copy-done", "slice-done"):
            op_bytes["copy/transpose"] += 2 * out_b
            op_cnt["copy/transpose"] += 1
            continue
        operands = re.findall(r"%([\w.\-]+)", line)
        in_b = sum(shapes.get(o, 0) for o in operands if o != name)
        label = op
        # custom-calls / fusions carry their kernel name in the line
        km = re.search(r'custom_call_target="([^"]+)"', line)
        if km:
            label = km.group(1)
        fm = re.search(r"calls=%?([\w.\-]+)", line)
        if fm:
            label = f"{op}:{fm.group(1)}"
        cls = "rest"
        for cname, rx in class_rx:
            if rx.search(label) or rx.search(line[:160]):
                cls = cname
                break
        op_bytes[cls] += out_b + in_b
        op_cnt[cls] += 1

    grand = sum(op_bytes.values())
    print(f"| class | GB moved | floor ms @819GB/s | insts |")
    print(f"|---|---|---|---|")
    for cls, b in sorted(op_bytes.items(), key=lambda kv: -kv[1]):
        print(f"| {cls} | {b / 1e9:.2f} | {b / HBM_BW * 1e3:.1f} "
              f"| {op_cnt[cls]} |")
    print(f"\ntotal: {grand / 1e9:.2f} GB, floor {grand / HBM_BW * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

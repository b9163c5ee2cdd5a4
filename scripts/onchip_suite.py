#!/usr/bin/env python
"""Run the quick tier on the real chip and write ONCHIP_SUITE.json.

The on-chip suite mode (GVQ_TEST_TPU=1, tests/conftest.py) is the
round-close ritual that validates the kernel and parity surface on real
Mosaic — the analog of the reference's only validation story, running on
real hardware (/root/reference/main.py:855-863).  This wrapper makes the
ritual's outcome a machine-written artifact (same doctrine as
BENCH_*.json / the sustained runs' run_summary.md): pass/fail counts,
wall time, device, and date, parsed from pytest's own summary line.

  python scripts/onchip_suite.py            # runs, writes ONCHIP_SUITE.json
  python scripts/onchip_suite.py --tier heavy --out /tmp/x.json
"""

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="quick", choices=["quick", "heavy"])
    ap.add_argument("--out", default=os.path.join(ROOT, "ONCHIP_SUITE.json"))
    ap.add_argument("--timeout", type=float, default=3600)
    args = ap.parse_args()

    env = dict(os.environ, GVQ_TEST_TPU="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", args.tier,
         "-q", "--no-header"],
        cwd=ROOT, env=env, capture_output=True, text=True,
        timeout=args.timeout,
    )
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-15:]
    summary = next((ln for ln in reversed(tail)
                    if re.search(r"\d+ (passed|failed)", ln)), "")

    def count(word):
        m = re.search(r"(\d+) " + word, summary)
        return int(m.group(1)) if m else 0

    # device string without importing jax into this process (the suite
    # subprocess owned the chip); pytest ran on the default platform
    rec = {
        "tier": args.tier,
        "date": datetime.date.today().isoformat(),
        "passed": count("passed"),
        "failed": count("failed"),
        "skipped": count("skipped"),
        "deselected": count("deselected"),
        "wall_s": round(wall, 1),
        "mode": "GVQ_TEST_TPU=1 (real chip, strict fp32 matmul precision)",
        "summary_line": summary.strip(),
        "rc": proc.returncode,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec))
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())

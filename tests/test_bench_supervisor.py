"""The headline bench must be un-losable (VERDICT r2 #1): bench.py is a
supervisor/worker pair whose supervisor never imports jax, retries failed
workers, and on total failure emits a staged sentinel instead of hanging or
dying silently.  These tests drive the real supervisor binary with workers
forced to fail fast (bogus JAX_PLATFORMS) and assert the two contractual
behaviors: (1) a total failure still prints exactly one JSON record naming
the stage reached; (2) SIGTERM mid-run flushes a record before exit (the
round-2 scoreboard zero came from a driver kill landing on a hung
single-process bench).
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

# no module-level tier mark: conftest assigns quick, except the total-failure
# sentinel test (HEAVY_TESTS — its staged worker retries take ~2 minutes)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")


def _env(**extra):
    env = dict(os.environ)
    # force every worker to die at import time: an unknown platform makes
    # jax.devices() raise immediately, modeling a hard-dead tunnel
    env["JAX_PLATFORMS"] = "no_such_platform"
    env.pop("XLA_FLAGS", None)
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _parse_single_json_line(out: str) -> dict:
    lines = [l for l in out.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one record line, got: {lines!r}"
    return json.loads(lines[0])


def test_total_failure_emits_staged_sentinel():
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(BENCH_TOTAL_BUDGET=25, BENCH_PROBE_BUDGET=8,
                 BENCH_MAX_ATTEMPTS=2),
        capture_output=True, text=True, timeout=240,
    )
    rec = _parse_single_json_line(proc.stdout)
    assert proc.returncode == 3
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    # the sentinel names the stage and the attempt trail, not a bare zero
    assert "FAILED" in rec["metric"]
    assert "stage=measure" in rec["metric"]
    assert "attempts=" in rec["metric"]


def test_sigterm_flushes_record():
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=_env(BENCH_TOTAL_BUDGET=3600, BENCH_PROBE_BUDGET=3000),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # signal only once the supervisor has spawned its first worker — the
    # handler is registered before any spawn, so a child's existence proves
    # registration (a fixed sleep raced interpreter startup under load)
    children = f"/proc/{proc.pid}/task/{proc.pid}/children"
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            with open(children) as f:
                if f.read().strip():
                    break
        except OSError:
            break  # no /proc: fall through after the poll loop's budget
        time.sleep(0.2)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    rec = _parse_single_json_line(out)
    # no successful measurement existed, so the flush is the failure record
    assert proc.returncode == 3
    assert rec["vs_baseline"] == 0.0
    assert "FAILED" in rec["metric"]

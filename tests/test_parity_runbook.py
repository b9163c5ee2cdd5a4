"""The one-command rFID parity runbook (scripts/verify_reference_parity.py)
must pass end-to-end in dress-rehearsal mode: convert -> torch sweep -> our
sweep -> deltas, on a synthetic bundle in the exact upstream formats."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_runbook_rehearsal_passes(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_reference_parity.py"),
         "--out", str(tmp_path / "params.msgpack")],
        capture_output=True, text=True, timeout=570, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["pass"], summary
    assert summary["mode"] == "rehearsal"
    assert summary["index_match"] >= 0.999
    assert summary["psnr_delta_db"] <= 0.05
    assert summary["rfid_delta"] <= 0.05
    # the rFID leg must be non-vacuous: degenerate (constant) inception
    # features would show up as rfid ~ 0 on both legs
    assert summary["rfid_torch"] > 1.0
    assert (tmp_path / "params.msgpack").exists()

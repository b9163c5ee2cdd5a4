"""2-process x 4-device multi-host training parity vs single-process.

The reference only ever exercises multi-node DDP on real hardware
(SURVEY.md §4 "no fixtures, fake process groups, gloo CI harnesses"); here
two jax.distributed CPU processes train the tiny GAN engine on per-process
data shards and the loss curve must match a single-process 8-device run of
the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "curve.json"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out)],
            cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    multi = json.loads(out.read_text())

    # single-process baseline on the 8-device mesh (conftest provides it)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from multihost_worker import run_curve  # type: ignore

    single = run_curve(0, 1)

    assert len(multi) == len(single)
    for s_log, m_log in zip(single, multi):
        for k in s_log:
            np.testing.assert_allclose(
                m_log[k], s_log[k], rtol=2e-4, atol=2e-4,
                err_msg=f"loss curve diverged at {k}",
            )

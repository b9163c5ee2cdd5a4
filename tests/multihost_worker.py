"""Worker for the 2-process x 4-device multi-host test (launched by
tests/test_multihost.py via subprocess).

Runs 4 training steps of the tiny GAN engine under jax.distributed with the
batch fed per-process through the loaders' shard protocol, and dumps the
loss curve.  The parent compares it against a single-process 8-device run -
the SPMD analog of verifying DDP against single-GPU training
(`/root/reference/main.py:693-708` has no such test; SURVEY.md §4 calls the
multi-device CPU mesh our gloo-fake-cluster equivalent).

Importable helpers (global_batch / local_shard / run_curve) are shared with
the in-process single-host baseline; the jax.distributed setup only happens
under __main__.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def global_batch(seed, n=8):
    rng = np.random.default_rng(seed)
    return {"img": rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)}


def local_shard(batch, pid, nproc):
    n = batch["img"].shape[0]
    per = n // nproc
    return {"img": batch["img"][pid * per:(pid + 1) * per]}


def run_curve(pid: int, nproc: int):
    """Init on the identical full global batch (bit-identical params incl.
    the data-dependent ActNorm init), then 3 ae steps + 1 disc step on
    per-process shards; returns the scalar log curve."""
    import jax

    from test_train_step import _tiny_engine
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from vqvae_from_gaussian_vae_tpu.parallel.train_state import TrainState, make_optimizers
    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

    engine = _tiny_engine()
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    state = builder.init_state(jax.random.PRNGKey(0), global_batch(0))
    mesh = make_mesh({"data": -1})
    assert mesh.devices.size == 8
    state = TrainState(
        step=replicate(mesh, state.step),
        engine_params=replicate(mesh, state.engine_params),
        loss_params=replicate(mesh, state.loss_params),
        ae_opt_state=replicate(mesh, state.ae_opt_state),
        disc_opt_state=replicate(mesh, state.disc_opt_state),
        duals=replicate(mesh, state.duals),
        rng=replicate(mesh, state.rng),
    )
    curve = []
    with mesh:
        for i in range(4):
            sharded = shard_batch(mesh, local_shard(global_batch(i + 1), pid, nproc))
            if i < 3:
                state, log = builder.ae_step(state, sharded, disc_active=False)
            else:
                state, log = builder.disc_step(state, sharded)
            curve.append({k: float(v) for k, v in log.items()})
    return curve


def _main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outfile = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

    curve = run_curve(pid, nproc)
    if pid == 0:
        with open(outfile, "w") as f:
            json.dump(curve, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    _main()

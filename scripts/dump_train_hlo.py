#!/usr/bin/env python
"""Dump the OPTIMIZED HLO of the GAN train steps (ae + disc phases) for
offline bandwidth-floor auditing (scripts/audit_fusion_bytes.py).

Usage:
  BENCH_CONFIG=sd3unet_gq_0.25 python scripts/dump_train_hlo.py /tmp/hlo_unet
  JAX_PLATFORMS=cpu DUMP_AOT=v5e:2x2 python scripts/dump_train_hlo.py /tmp/hlo

Writes <out>/ae.hlo.txt and <out>/disc.hlo.txt.  On the axon platform the
compile runs over the tunnel (TPU-true fusion decisions); off-TPU the CPU
compiler's fusions differ — only use TPU dumps for floor accounting.

DUMP_AOT=<topology> compiles against a TPU topology DESCRIPTOR instead of
live chips (works with the tunnel down; same machinery as
audit_collectives --overlap): params init on the host platform, then the
steps are lowered with fully-replicated ShapeDtypeStructs on the topology
mesh, so every device's program is the whole single-chip computation —
the right dump for single-chip floor accounting.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo"
    os.makedirs(out_dir, exist_ok=True)

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_name = os.environ.get("BENCH_CONFIG", "sd3unet_gq_0.25")
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    bases = [os.path.join(root, "configs", f"{base_name}.yaml"),
             os.path.join(root, "configs", "overlays", "bf16_compute.yaml")]
    cfg = load_config(bases)
    cfg["model"]["params"].pop("ckpt_path", None)

    engine = instantiate_from_config(cfg["model"])
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32)
    state = builder.init_state(jax.random.PRNGKey(0), {"img": x})
    state = state.replace(step=jnp.int32(engine.loss.disc_start + 10))
    batch_dev = {"img": jnp.asarray(x)}

    ae = jax.jit(lambda s, b: builder.ae_step(s, b, disc_active=True))
    disc = jax.jit(builder.disc_step)

    topo_name = os.environ.get("DUMP_AOT")
    if topo_name:
        from jax.experimental import topologies
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        topo = topologies.get_topology_desc(topo_name, "tpu")
        mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
        rep = NamedSharding(mesh, P())
        sds = lambda t: jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), t)
        state, batch_dev = sds(state), sds(batch_dev)

    for name, fn in (("ae", ae), ("disc", disc)):
        txt = fn.lower(state, batch_dev).compile().as_text()
        path = os.path.join(out_dir, f"{name}.hlo.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{path}: {len(txt) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()

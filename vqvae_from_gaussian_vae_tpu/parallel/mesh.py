"""Device mesh and sharding helpers.

The reference scales with Lightning DDP over NCCL (`/root/reference/main.py:
693-708`) and raw torch.distributed for eval (`eval.py:83-107`).  The
TPU-native equivalent is single-program SPMD: one jitted step over a
`jax.sharding.Mesh`, batches sharded on the ``data`` axis, params replicated
(a ``model`` axis is part of the mesh spec for future tensor parallelism).
XLA's GSPMD inserts the gradient psums that DDP hooks performed.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed():
    """Multi-host TPU-slice init (the reference's `num_nodes`/MULTINODE_HACKS
    analog, `main.py:864-877`): call jax.distributed.initialize() when the
    runtime exposes coordinator env vars; a no-op on single host."""
    import os

    if any(k in os.environ for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:
            print(f"jax.distributed.initialize skipped: {e}")


def make_mesh(spec: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from {axis: size}; size -1 absorbs remaining devices.

    Default: all devices on the data axis, model axis of 1 (ready for tp).
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = dict(spec or {})
    spec.setdefault(DATA_AXIS, -1)
    spec.setdefault(MODEL_AXIS, 1)
    known = int(np.prod([s for s in spec.values() if s > 0]))
    n = len(devices)
    assert n % known == 0, f"{n} devices not divisible by {spec}"
    sizes = {k: (s if s > 0 else n // known) for k, s in spec.items()}
    axis_names = tuple(sizes)
    shape = tuple(sizes[a] for a in axis_names)
    mesh_devices = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim split across the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (dict of arrays) onto the mesh, data-sharded.

    Single process: a plain device_put split.  Multi-host (the reference's
    DistributedSampler role, `eval.py:97-107`): every process holds its OWN
    per-host batch (the loaders are constructed with
    shard_id=jax.process_index()) and the global array is assembled with
    `jax.make_array_from_process_local_data` - global batch = per-host
    batch x process_count.
    """
    sh = batch_sharding(mesh)
    multi = jax.process_count() > 1

    def place(x):
        if not (hasattr(x, "shape") and getattr(x, "ndim", 0) > 0):
            return x
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch, is_leaf=lambda x: not isinstance(x, dict))


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def tensor_parallel_params(mesh: Mesh, params, min_size: int = 2**16):
    """Shard large kernels over the ``model`` axis (simple Megatron-style
    tensor parallelism): conv/dense kernels whose output-feature dim divides
    the axis size are split on that dim; everything else is replicated.
    GSPMD propagates the activation shardings and inserts the collectives.

    The reference has no TP (models fit one device, SURVEY.md 2.2); this
    keeps the mesh axis real so larger variants scale without a redesign.
    """
    tp = mesh.shape[MODEL_AXIS]
    if tp <= 1:
        return replicate(mesh, params)

    def place(path, x):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (
            leaf == "kernel"
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % tp == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, params)


# Megatron-style column/row pairing for the FLUX MMDiT blocks
# (models/flux.py).  The column matmul's output stays model-sharded through
# the elementwise nonlinearity and the row matmul contracts the sharded dim,
# so each (column, row) pair costs ONE all-reduce; GSPMD inserts it.  The
# reference has no TP at all (SURVEY.md 2.2 — its models fit one GPU), but
# flux-dev's 12B params exceed a single v5e's HBM, so the flux stack is the
# one model family that genuinely needs the `model` axis: these rules split
# every large block kernel 1/tp per chip.
FLUX_COLUMN_PARALLEL = (
    "attn_qkv", "linear1", "mlp_0",
    # AdaLN modulation matmuls (hidden -> 6*hidden per double block): their
    # outputs are per-sample vectors, so column-sharding them is free of
    # activation comm but moves ~28% of flux-dev's params off the
    # replicated set (8.6B -> 11.6B split of 11.9B)
    "mod/lin", "modulation/lin", "adaLN_modulation_1",
)
FLUX_ROW_PARALLEL = ("attn_proj", "linear2", "mlp_2")


def megatron_params(
    mesh: Mesh,
    params,
    column: Sequence[str] = FLUX_COLUMN_PARALLEL,
    row: Sequence[str] = FLUX_ROW_PARALLEL,
):
    """Column/row-shard transformer-block Dense kernels over ``model``.

    ``column``/``row`` are module-path suffixes (matched against the
    '/'-joined param path minus the leaf): a Dense whose path ends with a
    column suffix gets kernel P(None, model) + bias P(model);
    a row match gets kernel P(model, None) + replicated bias (the partial
    sums are all-reduced before the bias add).  Anything else — norms,
    modulation, embedders, LoRA deltas — is replicated.  Kernels whose
    shapes don't divide the axis fall back to replication rather than fail.

    Note the packed-qkv layout ([q|k|v] major) means GSPMD re-gathers the
    qkv activation at the head reshape, so attention FLOPs stay data-
    parallel; the matmul FLOPs and all block parameters (the HBM constraint
    that motivates TP here) are split 1/tp.  Head-sharded attention would
    need a heads-major qkv re-layout — documented in docs/kernels.md.
    """
    tp = mesh.shape[MODEL_AXIS]
    if tp <= 1:
        return replicate(mesh, params)

    def place(path, x):
        names = [p.key for p in path if hasattr(p, "key")]
        parent = "/".join(names[:-1])
        leaf = names[-1] if names else ""

        def put(spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        if any(parent.endswith(c) for c in column):
            if leaf == "kernel" and x.ndim == 2 and x.shape[1] % tp == 0:
                return put(P(None, MODEL_AXIS))
            if leaf == "bias" and x.shape[-1] % tp == 0:
                return put(P(MODEL_AXIS))
        if any(parent.endswith(r) for r in row):
            if leaf == "kernel" and x.ndim == 2 and x.shape[0] % tp == 0:
                return put(P(MODEL_AXIS, None))
        return put(P())

    return jax.tree_util.tree_map_with_path(place, params)

#!/usr/bin/env python
"""Multi-chip efficiency audit: per-step collective bytes from compiled HLO
plus an analytic weak-scaling model (VERDICT r2 weak #5).

The reference's distributed story is Lightning DDP allreduce + eval
all_gathers (`/root/reference/main.py:693-708`, `eval.py:83-107`); here the
GSPMD partitioner inserts the collectives, so the audit walks the OPTIMIZED
HLO of the actual jitted train steps and tabulates every collective op, its
bytes, and the mesh axis it rides (classified by replica-group size).

    python scripts/audit_collectives.py            # tiny engine, fast
    python scripts/audit_collectives.py --full     # real sd3unet_gq_0.25
    python scripts/audit_collectives.py --overlap  # v5e-scheduled overlap audit

Run under the 8-device virtual CPU mesh (tests/conftest.py pattern); byte
counts are mesh-size-independent for the dp all-reduce (ring algorithm moves
2B(N-1)/N per chip regardless of N), so the CPU-mesh numbers transfer to a
v5e pod slice as-is.

``--overlap`` (VERDICT r3 #6) AOT-compiles the SAME train steps against a
real ``v5e:4x2`` TPU topology (no chips needed — the TPU compiler accepts a
topology descriptor) and reads the *scheduled* HLO: for every collective it
reports wire dtype/bytes, whether the backend emitted it sync or async
(`-start`/`-done`), and its position in the schedule relative to the
backward's compute ops — the direct check of the weak-scaling table's
overlap assumption.  It also compiles the disc step with
``grad_allreduce_dtype=bfloat16`` and asserts the collective rides bf16.
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# virtual 8-device CPU mesh BEFORE jax import
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
               "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
               "s8": 1, "u8": 1, "pred": 1}

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

# v5e ICI: 2D torus, ~4.5e10 B/s per link per direction -> ~9e10 B/s
# bidirectional per torus axis per chip (public spec / scaling-book numbers)
V5E_ICI_BW_PER_AXIS = 9e10


def _shape_bytes(shape_str: str) -> int:
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


def audit_hlo(hlo_text: str, axis_of_group_size=None):
    """Tabulate collectives: {(opcode, axis): [count, bytes]}."""
    table = defaultdict(lambda: [0, 0])
    for line in hlo_text.splitlines():
        m = re.search(
            r"= ?((?:\([^)]*\))|(?:\S+)) (%s)(?:-start)?\(" % "|".join(COLLECTIVES),
            line,
        )
        if not m or f"{m.group(2)}-done" in line:
            continue
        shape, op = m.group(1), m.group(2)
        nbytes = _shape_bytes(shape)
        # two textual formats: explicit {{0,1,...}} lists and iota [G,S]<=[N]
        gm = re.search(r"replica_groups=\{\{([\d,]+)\}", line)
        if gm:
            gsize = len(gm.group(1).split(","))
        else:
            gm = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
            gsize = int(gm.group(2)) if gm else 0
        axis = (axis_of_group_size or {}).get(gsize, f"groups{gsize}")
        table[(op, axis)][0] += 1
        table[(op, axis)][1] += nbytes
    return dict(table)


def fmt_table(name, table):
    lines = [f"### {name}", "", "| collective | mesh axis | count | bytes/step |",
             "|---|---|---|---|"]
    total = 0
    for (op, axis), (count, nbytes) in sorted(table.items()):
        lines.append(f"| {op} | {axis} | {count} | {nbytes:,} |")
        total += nbytes
    lines.append(f"| **total** | | | **{total:,}** |")
    return "\n".join(lines), total


def weak_scaling(name, comm_bytes, flops_per_chip, peak=197e12,
                 bw=V5E_ICI_BW_PER_AXIS):
    """Ring all-reduce weak-scaling: per-chip compute fixed, comm 2B(N-1)/N."""
    lines = [f"### weak scaling — {name}",
             "",
             "| chips | t_compute (ms) | t_comm (ms) | eff (no overlap) | eff (full overlap) |",
             "|---|---|---|---|---|"]
    t_comp = flops_per_chip / peak
    for n in (2, 4, 8, 16):
        t_comm = 2 * comm_bytes * (n - 1) / n / bw
        eff_serial = t_comp / (t_comp + t_comm)
        eff_overlap = t_comp / max(t_comp, t_comm)
        lines.append(f"| {n} | {t_comp*1e3:.2f} | {t_comm*1e3:.2f} "
                     f"| {eff_serial:.3f} | {eff_overlap:.3f} |")
    return "\n".join(lines)


COMPUTE_OPS = ("fusion", "convolution", "custom-call", "dot")


def schedule_overlap_report(hlo_text: str, label: str):
    """Walk the scheduled ENTRY computation: for each collective report wire
    dtype/bytes, sync/async, and how much compute is scheduled after it.

    The TPU executable's HLO is printed in schedule order, so textual
    position IS issue order.  A sync collective at position p serializes:
    everything after p waits for the wire.  An async pair overlaps whatever
    sits between -start and -done."""
    lines = hlo_text.splitlines()
    entry_idx = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    body = []
    depth = 0
    for l in lines[entry_idx:]:
        body.append(l)
        depth += l.count("{") - l.count("}")
        if depth == 0 and len(body) > 1:
            break
    coll_tokens = [c + s for c in COLLECTIVES for s in ("", "-start", "-done")]
    events = []  # (op, name, dtype, bytes, position)
    n_compute = 0
    for l in body:
        m = re.match(r"\s*(?:ROOT )?%([\w.-]+) = ", l)
        if not m:
            continue
        name = m.group(1)
        rest = l[m.end():]
        op = None
        for tok in coll_tokens + list(COMPUTE_OPS):
            k = rest.find(" " + tok + "(")
            if k < 0 and rest.startswith(tok + "("):
                k = 0
            elif k >= 0:
                k += 1
            if k >= 0:
                op, opk = tok, k
                break
        if op is None:
            continue
        if op in COMPUTE_OPS:
            n_compute += 1
            continue
        shape = rest[:opk]  # result shape(s) only — operands sit after the op
        dts = sorted(set(re.findall(r"(\w+)\[", shape)))
        events.append([op, name, "/".join(dts), _shape_bytes(shape), n_compute])
    out = [f"### scheduled-HLO overlap — {label}", "",
           f"compute ops in schedule (fusion/conv/custom-call/dot): {n_compute}",
           "",
           "| collective | wire dtype | bytes | form | compute before | compute after |",
           "|---|---|---|---|---|---|"]
    starts = {}
    for op, name, dt, nb, pos in events:
        if op.endswith("-start"):
            starts[name.removesuffix(".start")] = (op, dt, nb, pos)
            continue
        if op.endswith("-done"):
            # pair with its start by stripping suffixes
            key = name
            srec = None
            for k in list(starts):
                if key.startswith(k.split(".")[0]):
                    srec = starts.pop(k)
                    break
            if srec:
                _, dt0, nb0, pos0 = srec
                out.append(f"| {op.removesuffix('-done')} (async) | {dt0} "
                           f"| {nb0:,} | start@{pos0} done@{pos} "
                           f"| {pos0} | {n_compute - pos} |")
            continue
        out.append(f"| {op} | {dt} | {nb:,} | **sync** | {pos} | {n_compute - pos} |")
    return "\n".join(out)


def overlap_audit(args):
    """AOT-compile the dp train steps for a real v5e:4x2 topology and audit
    the schedule (VERDICT r3 #6).  Needs the TPU compiler (axon plugin)."""
    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
    from vqvae_from_gaussian_vae_tpu.parallel.trainer import make_optimizers

    topo = topologies.get_topology_desc("v5e:4x2", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(8), ("data",))

    if args.full:
        from vqvae_from_gaussian_vae_tpu import instantiate_from_config
        from vqvae_from_gaussian_vae_tpu.utils.config import load_config

        bases = ["configs/sd3unet_gq_0.25.yaml"]
        if args.bf16:
            bases.append("configs/overlays/bf16_compute.yaml")
        cfg = load_config(bases)
        cfg["model"]["params"].pop("ckpt_path", None)
        engine = instantiate_from_config(cfg["model"])
        res, label = 256, "sd3unet_gq_0.25 (v5e:4x2 scheduled)"
    else:
        from tests.test_train_step import _tiny_engine

        engine = _tiny_engine()
        res, label = 32, "tiny engine (v5e:4x2 scheduled)"

    rng = np.random.default_rng(0)
    batch = {"img": rng.uniform(-1, 1, (args.bs, res, res, 3)).astype(np.float32)}
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    state = builder.init_state(jax.random.PRNGKey(0), batch)

    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    state_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp_shape(a), a.dtype, sharding=rep), state)
    batch_sds = {"img": jax.ShapeDtypeStruct(batch["img"].shape, np.float32,
                                             sharding=dsh)}
    sections = []
    ae_hlo = builder.ae_step.lower(
        state_sds, batch_sds, disc_active=True).compile().as_text()
    disc_hlo = builder.disc_step.lower(state_sds, batch_sds).compile().as_text()
    for phase, hlo in (("ae_step", ae_hlo), ("disc_step", disc_hlo)):
        sections.append(schedule_overlap_report(hlo, f"{label} — {phase}"))
        print(sections[-1], "\n")

    # the bf16 grad-allreduce knob: wire dtype must be bf16 on this backend
    kb = TrainStepBuilder(engine, ae_opt, disc_opt,
                          grad_allreduce_dtype="bfloat16", mesh=mesh)
    knob_hlo = kb.disc_step.lower(state_sds, batch_sds).compile().as_text()
    sections.append(schedule_overlap_report(
        knob_hlo, f"{label} — disc_step + grad_allreduce_dtype=bf16"))
    print(sections[-1], "\n")
    n_bf16_ar = len(re.findall(r"bf16[^=]*all-reduce\(|all-reduce[^=]*= \(?bf16",
                               knob_hlo))
    has_bf16 = any("bf16" in l and "all-reduce" in l
                   for l in knob_hlo.splitlines())
    print(f"bf16 all-reduce present with knob: {has_bf16} (matches={n_bf16_ar})")

    with open("/tmp/overlap_audit.md", "w") as f:
        f.write("\n\n".join(sections) + "\n")
    print("wrote /tmp/overlap_audit.md")


def jnp_shape(a):
    return tuple(a.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="audit the real sd3unet_gq_0.25 (slow CPU compile)")
    ap.add_argument("--bs", type=int, default=8, help="global batch (dp=8)")
    ap.add_argument("--overlap", action="store_true",
                    help="AOT v5e:4x2 scheduled-HLO overlap audit")
    ap.add_argument("--bf16", action="store_true",
                    help="with --overlap --full: apply the bf16 compute overlay")
    args = ap.parse_args()
    import jax

    # this machine pins JAX_PLATFORMS=axon and the plugin wins over
    # os.environ; force the virtual CPU mesh the conftest way.  The
    # --overlap mode only needs the TPU *compiler* (topology AOT), which is
    # independent of the runtime platform.
    jax.config.update("jax_platforms", "cpu")
    if args.overlap:
        return overlap_audit(args)

    import numpy as np

    from vqvae_from_gaussian_vae_tpu.parallel.mesh import (
        make_mesh, megatron_params, replicate, shard_batch,
    )
    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
    from vqvae_from_gaussian_vae_tpu.parallel.trainer import make_optimizers
    from vqvae_from_gaussian_vae_tpu.utils import flops as FL

    sections = []

    # ---------------- dp=8 GAN train steps ----------------
    if args.full:
        from vqvae_from_gaussian_vae_tpu import instantiate_from_config
        from vqvae_from_gaussian_vae_tpu.utils.config import load_config

        cfg = load_config("configs/sd3unet_gq_0.25.yaml")
        cfg["model"]["params"].pop("ckpt_path", None)
        engine = instantiate_from_config(cfg["model"])
        res = 256
        label = "sd3unet_gq_0.25 (full, 256px)"
    else:
        from tests.test_train_step import _tiny_engine

        engine = _tiny_engine()
        res = 32
        label = "tiny sd3unet-shape engine (32px)"

    rng = np.random.default_rng(0)
    batch = {"img": rng.uniform(-1, 1, (args.bs, res, res, 3)).astype(np.float32)}
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    mesh = make_mesh({"data": -1})
    state = builder.init_state(jax.random.PRNGKey(0), batch)
    state = state.replace(
        engine_params=replicate(mesh, state.engine_params),
        loss_params=replicate(mesh, state.loss_params),
        ae_opt_state=replicate(mesh, state.ae_opt_state),
        disc_opt_state=replicate(mesh, state.disc_opt_state),
        duals=replicate(mesh, state.duals),
        rng=jax.device_put(state.rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
        step=jax.device_put(state.step, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
    )
    n_engine = sum(x.size for x in jax.tree.leaves(state.engine_params))
    n_disc = sum(x.size for x in jax.tree.leaves(state.loss_params.get("discriminator", {})))
    print(f"auditing {label}: {n_engine/1e6:.2f} M engine params, "
          f"{n_disc/1e6:.2f} M disc params, dp=8, bs={args.bs}")

    axis_map = {8: "data", 1: "(self)"}
    with mesh:
        sbatch = shard_batch(mesh, batch)
        ae_hlo = builder.ae_step.lower(state, sbatch, disc_active=True).compile().as_text()
        disc_hlo = builder.disc_step.lower(state, sbatch).compile().as_text()
    for phase, hlo in (("ae_step (generator phase)", ae_hlo),
                       ("disc_step (discriminator phase)", disc_hlo)):
        tbl = audit_hlo(hlo, axis_map)
        text, total = fmt_table(f"{label} — {phase}", tbl)
        sections.append(text)
        print(text, "\n")

    # analytic cross-check: the ae grad all-reduce moves ~4 B/trainable
    # engine param (fp32, enc+dec+reg+logvar); the disc step ~4 B/disc param
    print(f"(cross-check: ae ~ {4*n_engine:,} B [4 B x {n_engine:,} engine params]; "
          f"disc ~ {4*n_disc:,} B [4 B x {n_disc:,}])")

    # weak-scaling (full mode only: needs the real FLOP model)
    if args.full:
        bs_chip = args.bs // 8
        enc_cfg = cfg["model"]["params"]["encoder_config"]["params"]
        step_flops = FL.gan_train_step_flops(enc_cfg, img=res)  # per image
        for phase, hlo in (("ae_step", ae_hlo), ("disc_step", disc_hlo)):
            _, total = fmt_table("", audit_hlo(hlo, axis_map))
            sections.append(weak_scaling(
                f"{label} {phase}, bs/chip={bs_chip}", total,
                step_flops[phase] * bs_chip))
            print(sections[-1], "\n")

    # ---------------- dp x tp flux MMDiT ----------------
    from tests.test_flux import TINY, _inputs
    from vqvae_from_gaussian_vae_tpu.models import flux as F

    model = F.Flux(TINY, remat=False)
    img, img_ids, txt, txt_ids, t, y, g = _inputs(b=4)
    params = model.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids,
                        t, y, None, g)["params"]
    tpmesh = make_mesh({"data": 4, "model": 2})
    params_s = megatron_params(tpmesh, params)  # returns placed arrays
    bspec = jax.sharding.NamedSharding(tpmesh, jax.sharding.PartitionSpec("data"))
    args_s = [jax.device_put(np.asarray(a), bspec) for a in (img, img_ids, txt, txt_ids, t, y)]
    g_s = jax.device_put(np.asarray(g), bspec)

    @jax.jit
    def fwd(p, img, img_ids, txt, txt_ids, t, y, g):
        return model.apply({"params": p}, img, img_ids, txt, txt_ids, t, y, None, g)

    with tpmesh:
        hlo = fwd.lower(params_s, *args_s, g_s).compile().as_text()
    tbl = audit_hlo(hlo, {2: "model (tp)", 4: "data", 8: "data x model"})
    text, _ = fmt_table("flux MMDiT fwd — dp=4 x tp=2 (Megatron, tiny dims)", tbl)
    sections.append(text)
    print(text)

    out = "\n\n".join(sections)
    with open("/tmp/collective_audit.md", "w") as f:
        f.write(out + "\n")
    print("\nwrote /tmp/collective_audit.md")


if __name__ == "__main__":
    main()

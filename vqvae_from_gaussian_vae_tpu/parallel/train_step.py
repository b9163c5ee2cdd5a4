"""Jitted SPMD training steps for the two-phase GAN objective.

The reference alternates two torch optimizers inside a Lightning
training_step (`/root/reference/pit/models/autoencoder.py:489-505`): phase 0
(autoencoder) on even batches, phase 1 (discriminator) on odd ones, with
phase forced to 0 before ``disc_start_iter``.  Here each phase is its own
jitted function; the host trainer picks which to call (step parity and
disc-start gating are host-side static decisions, so XLA never traces
data-dependent control flow).

Under a `jax.sharding.Mesh` the batch is sharded on the ``data`` axis and
params are replicated: GSPMD inserts the gradient all-reduces that DDP hooks
performed, and every batch statistic (loss means, GQ KL stats feeding the
dual updates) is computed over the *global* batch - fixing the reference's
per-rank, never-synced dual variables (SURVEY.md 2.4).

The adaptive discriminator weight (`discriminator_loss.py:211-220`) is two
VJPs w.r.t. only the decoder's final projection: the decoder runs once to
the pre-last-layer cut, and the NLL/generator losses are re-expressed as
functions of that single kernel - same cost profile as the reference's
``torch.autograd.grad(..., last_layer)``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vqvae_from_gaussian_vae_tpu.parallel.train_state import TrainState
from vqvae_from_gaussian_vae_tpu.quantization import gaussian as gq


def _dual_config(reg) -> Optional[Tuple[float, float, float, Tuple[float, float]]]:
    """(log2 codebook, tolerance, lam_factor, lam_range) for GQ regularizers."""
    if isinstance(reg, gq.GaussianQuantRegularizer):
        return (int(math.log2(reg.n_samples)), reg.tolerance, reg.lam_factor, (1e-3, 1e3))
    if isinstance(reg, gq.GaussianQuantRegularizer2):
        return (int(math.log2(reg.codebook_size)), reg.tolerance, reg.lam_factor, reg.lam_range)
    return None


def _set_path(tree, path, value):
    """Immutable nested-dict update."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _cast_reduce_grads(grads, mesh, dtype):
    """Reduce data-parallel gradient partial sums in ``dtype`` (bf16 halves
    the all-reduce wire bytes on a TPU mesh — the disc-phase mitigation named
    in docs/architecture.md's weak-scaling table).

    GSPMD alone cannot express this: a plain ``astype`` lands AFTER the
    partitioner resolves the partial sum, so the all-reduce stays fp32
    (verified in tests/test_train_step.py).  Explicit-sharding ``unreduced``
    specs move the cast in front of the cross-chip sum: the grads enter the
    explicit region declared unreduced over ``data``, are cast, and the
    ``reshard`` to a fully-reduced spec materialises the all-reduce over the
    cast dtype.  On the TPU backend the collective then rides bf16 (half
    bytes, AOT-verified against a v5e:4x2 topology); the CPU backend's
    AllReducePromotion pass widens the wire format back to fp32 but keeps
    the bf16 rounding semantics, so CPU tests still pin the numerics.
    """
    from jax.sharding import PartitionSpec, explicit_axes, reshard

    @explicit_axes(axes="data")
    def _inner(gs):
        return jax.tree.map(
            lambda g: reshard(
                g.astype(dtype), PartitionSpec(*([None] * g.ndim))
            ).astype(g.dtype),
            gs,
        )

    spec = jax.tree.map(
        lambda g: PartitionSpec(*([None] * g.ndim), unreduced={"data"}), grads
    )
    return _inner(grads, in_sharding=(spec,))


class _MeshCtxFn:
    """Calls a jitted step under ``jax.set_mesh`` (the ambient mesh that
    explicit-sharding regions inside the step need)."""

    def __init__(self, fn, mesh):
        self._fn = fn
        self._mesh = mesh

    def __call__(self, *args, **kwargs):
        with jax.set_mesh(self._mesh):
            return self._fn(*args, **kwargs)

    def lower(self, *args, **kwargs):
        with jax.set_mesh(self._mesh):
            return self._fn.lower(*args, **kwargs)


class TrainStepBuilder:
    """Builds the jitted ae/disc/eval steps for an AutoencodingEngine.

    ``grad_allreduce_dtype`` (with ``mesh``) reduces data-parallel gradient
    partial sums in that dtype (e.g. ``jnp.bfloat16``) instead of fp32 —
    half the per-step collective bytes for the phase it is applied to
    (``grad_allreduce_phases``, default disc-only: the disc phase has the
    highest comm/compute ratio in the weak-scaling model,
    docs/architecture.md)."""

    def __init__(self, engine, ae_opt: optax.GradientTransformation,
                 disc_opt: optax.GradientTransformation,
                 grad_allreduce_dtype=None, mesh=None,
                 grad_allreduce_phases=("disc",)):
        assert engine.loss is not None, "engine was built eval_only / without a loss"
        self.engine = engine
        self.module = engine.module
        self.loss_mod = engine.loss
        self.ae_opt = ae_opt
        self.disc_opt = disc_opt
        self.grad_allreduce_dtype = (
            jnp.dtype(grad_allreduce_dtype) if grad_allreduce_dtype else None
        )
        self.grad_allreduce_phases = tuple(grad_allreduce_phases)
        self.mesh = mesh
        if self.grad_allreduce_dtype is not None:
            if mesh is None or "data" not in mesh.axis_names:
                raise ValueError(
                    "grad_allreduce_dtype needs a mesh with a 'data' axis")
            # under bf16 COMPUTE the TPU backend already emits the gradient
            # all-reduces over the bf16 wgrad partials (AOT-audited,
            # scripts/audit_collectives.py --overlap --full --bf16: ae
            # 48+126 MB bf16, disc 113+79 MB bf16 with no knob); stacking
            # the explicit unreduced region on top makes the partitioner
            # reduce the partials a SECOND time (correct values, 2x wire
            # bytes).  The knob is for fp32-compute training — the
            # reference's own precision: 32 mode — where it halves bytes.
            import warnings

            drop = []
            loss_bf16 = jnp.dtype(getattr(self.loss_mod, "dtype", jnp.float32)) == jnp.bfloat16
            eng_bf16 = jnp.dtype(getattr(engine.encoder, "dtype", None)
                                 or jnp.float32) == jnp.bfloat16
            if loss_bf16 and "disc" in self.grad_allreduce_phases:
                drop.append("disc")
            if (loss_bf16 or eng_bf16) and "ae" in self.grad_allreduce_phases:
                drop.append("ae")
            if drop:
                warnings.warn(
                    f"grad_allreduce_dtype: phases {drop} already run bf16 "
                    "compute — their grad collectives ride bf16 natively and "
                    "the knob would double the wire bytes; skipping them")
                self.grad_allreduce_phases = tuple(
                    p for p in self.grad_allreduce_phases if p not in drop)
        self.dual_cfg = _dual_config(engine.regularization)
        self.last_layer_path = ("decoder",) + tuple(engine.decoder.last_layer_path())
        self.enc_last_layer_path = ("encoder",) + tuple(engine.encoder.last_layer_path())
        self.vf_adaptive = bool(engine.use_vf) and bool(
            getattr(self.loss_mod, "adaptive_vf", False)
        )
        self.ae_step = jax.jit(self._ae_step, static_argnames=("disc_active",), donate_argnums=(0,))
        self.disc_step = jax.jit(self._disc_step, donate_argnums=(0,))
        self.eval_step = jax.jit(self._eval_step)
        if self.grad_allreduce_dtype is not None:
            # explicit_axes needs the ambient mesh, and jax.set_mesh refuses
            # to run inside a trace — wrap the jit CALL (and .lower)
            self.ae_step = _MeshCtxFn(self.ae_step, self.mesh)
            self.disc_step = _MeshCtxFn(self.disc_step, self.mesh)

    # ----------------------------------------------------------- pieces

    def _forward_split(self, engine_params, x, rng, duals):
        """encode -> (z, reg_log), decoder trunk h, and xrec = head(h)."""
        z, reg_log = self.module.apply(
            {"params": engine_params}, x, return_reg_log=True, train=True,
            duals=duals, method="encode", rngs={"sample": rng},
        )
        h = self.module.apply(
            {"params": engine_params}, z, train=True, method="decode_pre_last_layer"
        )
        xrec = self.module.apply(
            {"params": engine_params}, h, train=True, method="decode_last_layer"
        )
        if self.engine.use_vf:
            aux, zp = self.module.apply(
                {"params": engine_params}, x, z, method="vf_features"
            )
            reg_log = dict(reg_log)
            reg_log["aux_feature"] = aux
            reg_log["zp"] = zp
        return z, reg_log, h, xrec

    def _adaptive_d_weight(self, engine_params, loss_params, x, h):
        """d_weight = ||d nll/d w_last|| / (||d g/d w_last|| + 1e-4), clamped
        and scaled (`discriminator_loss.py:211-220`)."""
        h = jax.lax.stop_gradient(h)
        x = jax.lax.stop_gradient(x)
        w0 = _get_path(engine_params, self.last_layer_path)

        def rec_of_w(w):
            p2 = _set_path(engine_params, self.last_layer_path, w)
            return self.module.apply({"params": p2}, h, train=True, method="decode_last_layer")

        def nll_of_w(w):
            nll, _ = self.loss_mod.apply(
                {"params": loss_params}, x, rec_of_w(w), method="nll_from_images"
            )
            return nll

        def g_of_w(w):
            return self.loss_mod.apply(
                {"params": loss_params}, rec_of_w(w), train=True, method="g_loss"
            )

        nll_grad = jax.grad(nll_of_w)(w0)
        g_grad = jax.grad(g_of_w)(w0)
        d_weight = jnp.linalg.norm(nll_grad.reshape(-1)) / (
            jnp.linalg.norm(g_grad.reshape(-1)) + 1e-4
        )
        d_weight = jnp.clip(d_weight, 0.0, 1e4)
        return jax.lax.stop_gradient(d_weight) * self.loss_mod.disc_weight

    def _update_duals(self, duals, reg_log):
        if self.dual_cfg is None or "bits-mean" not in reg_log:
            return duals
        log_n, tol, factor, lam_range = self.dual_cfg
        stats = {k: reg_log[k] for k in ("bits-mean", "bits-min", "bits-max")}
        return gq.update_duals(duals, stats, log_n, tol, factor, lam_range)

    def _adaptive_vf_weight(self, engine_params, loss_params, x, rng, duals):
        """vf_weight = ||d nll/d w_enc|| / (||d vf/d w_enc|| + 1e-4) * vf_weight
        (`discriminator_loss.py:222-233`): one extra forward + two VJPs
        w.r.t. only the encoder's final projection."""
        x = jax.lax.stop_gradient(x)
        w0 = _get_path(engine_params, self.enc_last_layer_path)

        def both(w):
            p2 = _set_path(engine_params, self.enc_last_layer_path, w)
            _, xrec, reg_log = self.module.apply(
                {"params": p2}, x, train=True, duals=duals, rngs={"sample": rng}
            )
            nll, _ = self.loss_mod.apply(
                {"params": loss_params}, x, xrec, method="nll_from_images"
            )
            vf = self.loss_mod.apply(
                {"params": loss_params}, reg_log, method="vf_loss"
            )
            return nll, vf

        _, vjp = jax.vjp(both, w0)
        (nll_grad,) = vjp((jnp.float32(1.0), jnp.float32(0.0)))
        (vf_grad,) = vjp((jnp.float32(0.0), jnp.float32(1.0)))
        w = jnp.linalg.norm(nll_grad.reshape(-1)) / (
            jnp.linalg.norm(vf_grad.reshape(-1)) + 1e-4
        )
        w = jnp.clip(w, 0.0, 1e8)
        return jax.lax.stop_gradient(w) * self.loss_mod.vf_weight

    # ----------------------------------------------------------- phase 0

    def _ae_loss(self, diff_params, state, x, rng, disc_active: bool):
        engine_params, logvar = diff_params
        loss_params = {**state.loss_params, "logvar": logvar}
        z, reg_log, h, xrec = self._forward_split(engine_params, x, rng, state.duals)
        d_weight = None
        if disc_active:
            d_weight = self._adaptive_d_weight(engine_params, loss_params, x, h)
        vf_weight = None
        if self.vf_adaptive and "zp" in reg_log:
            vf_weight = self._adaptive_vf_weight(engine_params, loss_params, x, rng, state.duals)
        loss_val, log = self.loss_mod.apply(
            {"params": loss_params}, x, xrec,
            regularization_log=reg_log, optimizer_idx=0,
            global_step=state.step, split="train",
            d_weight=d_weight if disc_active else jnp.float32(0.0),
            vf_weight=vf_weight,
            train=True,
        )
        return loss_val, (log, reg_log)

    def _ae_step(self, state: TrainState, batch, disc_active: bool):
        rng, sub = jax.random.split(state.rng)
        x = batch["img"]
        logvar = state.loss_params["logvar"]
        grads, (log, reg_log) = jax.grad(self._ae_loss, has_aux=True)(
            (state.engine_params, logvar), state, x, sub, disc_active
        )
        if self.grad_allreduce_dtype is not None and "ae" in self.grad_allreduce_phases:
            grads = _cast_reduce_grads(grads, self.mesh, self.grad_allreduce_dtype)
        if not self.loss_mod.learn_logvar:
            # mirror the reference's requires_grad=learn_logvar: a phantom
            # logvar grad must not advance the (possibly norm-coupled)
            # optimizer state (discriminator_loss.py:41-44)
            grads = (grads[0], jnp.zeros_like(grads[1]))
        updates, new_opt = self.ae_opt.update(
            grads, state.ae_opt_state, (state.engine_params, logvar)
        )
        new_engine, new_logvar = optax.apply_updates((state.engine_params, logvar), updates)
        if not self.loss_mod.learn_logvar:
            new_logvar = logvar
        new_state = state.replace(
            step=state.step + 1,
            engine_params=new_engine,
            loss_params={**state.loss_params, "logvar": new_logvar},
            ae_opt_state=new_opt,
            duals=self._update_duals(state.duals, reg_log),
            rng=rng,
        )
        return new_state, log

    # ----------------------------------------------------------- phase 1

    def _disc_loss(self, disc_params, state, x, xrec):
        loss_params = {**state.loss_params, "discriminator": disc_params}
        d, log = self.loss_mod.apply(
            {"params": loss_params}, x, xrec,
            regularization_log={}, optimizer_idx=1,
            global_step=state.step, split="train", train=True,
        )
        return d, log

    def _disc_step(self, state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        x = batch["img"]
        # recompute reconstructions without engine grads (the reference's
        # phase-1 forward, autoencoder.py:432 under opt.toggle_model).
        # encode runs train=True for the regularizer's reparam sample +
        # dual statistics; decode is gradient-free here, so it runs
        # train=False and picks up the inference-path fused kernels
        # (models/unet.py) under bf16 compute
        z, reg_log = self.module.apply(
            {"params": state.engine_params}, x, return_reg_log=True,
            train=True, duals=state.duals, method="encode", rngs={"sample": sub},
        )
        xrec = self.module.apply(
            {"params": state.engine_params}, z, train=False, method="decode"
        )
        xrec = jax.lax.stop_gradient(xrec)
        disc_params = state.loss_params["discriminator"]
        grads, log = jax.grad(self._disc_loss, has_aux=True)(disc_params, state, x, xrec)
        if self.grad_allreduce_dtype is not None and "disc" in self.grad_allreduce_phases:
            grads = _cast_reduce_grads(grads, self.mesh, self.grad_allreduce_dtype)
        updates, new_opt = self.disc_opt.update(grads, state.disc_opt_state, disc_params)
        new_disc = optax.apply_updates(disc_params, updates)
        new_state = state.replace(
            step=state.step + 1,
            loss_params={**state.loss_params, "discriminator": new_disc},
            disc_opt_state=new_opt,
            # the reference's regularizer updates its dual lambdas on EVERY
            # training forward, including the disc phase (gaussian.py:100-115)
            duals=self._update_duals(state.duals, reg_log),
            rng=rng,
        )
        return new_state, log

    # ----------------------------------------------------------- eval

    def _eval_step(self, state: TrainState, batch):
        """Validation losses for both phases (autoencoder.py:511-547)."""
        rng = jax.random.fold_in(state.rng, 17)
        x = batch["img"]
        z, xrec, reg_log = self.module.apply(
            {"params": state.engine_params}, x, train=False, duals=state.duals,
            rngs={"sample": rng},
        )
        _, log = self.loss_mod.apply(
            {"params": state.loss_params}, x, xrec,
            regularization_log=reg_log, optimizer_idx=0,
            global_step=state.step, split="val", train=False,
        )
        _, log1 = self.loss_mod.apply(
            {"params": state.loss_params}, x, xrec,
            regularization_log=reg_log, optimizer_idx=1,
            global_step=state.step, split="val", train=False,
        )
        return {**log, **log1}

    # ----------------------------------------------------------- init

    def init_state(self, rng: jax.Array, example_batch, learning_rate: float = None) -> TrainState:
        from vqvae_from_gaussian_vae_tpu.parallel.train_state import init_train_state

        x = example_batch["img"]
        if self.engine.params is None:
            self.engine.init_params(jax.random.fold_in(rng, 0), example=jnp.asarray(x))
        engine_params = self.engine.params
        # loss params init on a real batch: ActNorm data-dependent init sees
        # genuine image statistics (losses/discriminator.py)
        _, xrec, _ = self.module.apply(
            {"params": engine_params}, jnp.asarray(x), train=False,
            rngs={"sample": jax.random.fold_in(rng, 1)},
        )
        loss_vars = self.loss_mod.init(
            {"params": jax.random.fold_in(rng, 2)},
            jnp.asarray(x), xrec, method="init_all",
        )
        return init_train_state(
            jax.random.fold_in(rng, 3),
            engine_params,
            loss_vars["params"],
            self.ae_opt,
            self.disc_opt,
        )

"""UNet remat equivalence + gradient-accumulation semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models.unet import Encoder
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers

CFG = dict(attn_type="vanilla", double_z=True, z_channels=4, resolution=32,
           in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
           attn_resolutions=[16], dropout=0.0)


def test_unet_remat_matches_plain_forward_and_grad():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    plain = Encoder(**CFG)
    remat = Encoder(**CFG, remat=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    out_p = plain.apply({"params": params}, x, train=True)
    out_r = remat.apply({"params": params}, x, train=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-6)

    gp = jax.grad(lambda p: jnp.sum(plain.apply({"params": p}, x, train=True) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(remat.apply({"params": p}, x, train=True) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradient_accumulation_equals_big_batch():
    import optax

    ae_opt, _ = make_optimizers(1e-2, accumulate_grad_batches=2)
    big_opt, _ = make_optimizers(1e-2)
    w = jnp.ones((3,))

    def grad_fn(w, x):
        return jax.grad(lambda w: jnp.sum((w * x) ** 2))(w)

    x1 = jnp.asarray([1.0, 2.0, 3.0])
    x2 = jnp.asarray([2.0, 0.5, 1.0])

    # accumulate two half-batches
    s = ae_opt.init(w)
    wa = w
    for x in (x1, x2):
        u, s = ae_opt.update(grad_fn(wa, x) / 2.0, s, wa)
        wa = optax.apply_updates(wa, u)

    # single mean-gradient step
    sb = big_opt.init(w)
    g = (grad_fn(w, x1) + grad_fn(w, x2)) / 2.0
    u, _ = big_opt.update(g, sb, w)
    wb = optax.apply_updates(w, u)
    np.testing.assert_allclose(np.asarray(wa), np.asarray(wb), rtol=1e-6)

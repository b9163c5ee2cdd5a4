"""The optional phase-conv upsample must match the plain nearest+conv path
exactly (shared params, fp rounding tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models.unet import Upsample


def test_fused_upsample_matches_plain():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    plain = Upsample(16, fused=False)
    fused = Upsample(16, fused=True)
    variables = fused.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]["conv"]) == {"kernel", "bias"}
    out_f = fused.apply(variables, x)
    out_p = plain.apply(variables, x)
    assert out_f.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)

"""Eval-time LPIPS metric (`/root/reference/pit/evaluations/lpips.py`, which
wraps the pip `lpips` package with net="alex").

The AlexNet trunk follows the torchvision layout (5 ReLU taps at channels
64/192/384/256/256) so the lpips package's weights convert mechanically when
supplied.  Unlike the reference - which re-instantiates the LPIPS network on
every call (`evaluations/lpips.py:10`, flagged in SURVEY.md 2.4) - the
metric object builds and jits once.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.losses.lpips import NetLinLayer, _normalize_tensor


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with taps after each ReLU."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        # indices mirror torchvision AlexNet.features for weight conversion
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name="features_0")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], dtype=self.dtype,
                    name="features_3")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="features_6")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="features_8")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="features_10")(x)
        x = nn.relu(x); taps.append(x)
        return taps


class LPIPSAlex(nn.Module):
    """lpips-package-compatible distance on the AlexNet trunk."""

    def setup(self):
        self.scaling_shift = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
        self.scaling_scale = jnp.array([0.458, 0.448, 0.450], jnp.float32)
        self.net = AlexNetFeatures()
        self.lin0 = NetLinLayer()
        self.lin1 = NetLinLayer()
        self.lin2 = NetLinLayer()
        self.lin3 = NetLinLayer()
        self.lin4 = NetLinLayer()

    def __call__(self, input, target):
        lins = (self.lin0, self.lin1, self.lin2, self.lin3, self.lin4)
        in0 = (input - self.scaling_shift) / self.scaling_scale
        in1 = (target - self.scaling_shift) / self.scaling_scale
        outs0, outs1 = self.net(in0), self.net(in1)
        val = None
        for t0, t1, lin in zip(outs0, outs1, lins):
            diff = (_normalize_tensor(t0) - _normalize_tensor(t1)) ** 2
            res = jnp.mean(lin(diff), axis=(1, 2), keepdims=True)
            val = res if val is None else val + res
        return val


class LPIPSMetric:
    """Build-once, jit-once LPIPS metric (alex or vgg)."""

    def __init__(self, network_type: str = "alex", weights_path: Optional[str] = None,
                 seed: int = 0):
        assert network_type in ("alex", "vgg")
        if network_type == "alex":
            self.module = LPIPSAlex()
        else:
            from vqvae_from_gaussian_vae_tpu.losses.lpips import LPIPS

            self.module = LPIPS()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self.variables = self.module.init({"params": jax.random.PRNGKey(seed)}, x, x)
        if weights_path:
            self.load_weights(weights_path)
        self._fn = jax.jit(lambda v, a, b: self.module.apply(v, a, b))

    def load_weights(self, path: str):
        """Convert lpips-package weights (net.slice/lin layout) or raw
        torchvision trunks onto the params template."""
        from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        prefix_map = {"lin": "lin", "net.": "net.", "features.": "net.features."}
        params, missing, unexpected = convert_state_dict(
            sd, self.variables["params"], prefix_map=prefix_map
        )
        self.variables = {"params": params}
        return missing, unexpected

    def __call__(self, x, y, zero_mean: bool = True):
        """Per-sample distance; zero_mean means inputs already in [-1, 1]
        (`evaluations/lpips.py:5-9`)."""
        if not zero_mean:
            x = x * 2.0 - 1.0
            y = y * 2.0 - 1.0
        return self._fn(self.variables, x, y)[:, 0, 0, 0]


def get_lpips(x_input, x_recon, zero_mean: bool = False, network_type: str = "alex",
              is_video: bool = False, _cache={}):
    """Reference-signature wrapper; caches the metric per network type
    (fixing the rebuild-per-call defect)."""
    if network_type not in _cache:
        _cache[network_type] = LPIPSMetric(network_type)
    return _cache[network_type](x_input, x_recon, zero_mean=zero_mean)

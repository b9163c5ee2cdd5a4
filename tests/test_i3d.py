"""I3D / FVD: flax InceptionI3d vs an in-test torch oracle implementing the
canonical pytorch-i3d semantics (TF-SAME padding, bias-free Conv3d + BN
eps=1e-3 + ReLU units, 400-d logits head averaged over time) — the network
inside the reference's torchscript FVD detector
(`/root/reference/pit/evaluations/fvd/fvd_score.py:10-19`)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.evaluations.i3d import (
    InceptionI3d, load_i3d_weights, make_i3d_feature_fn, _MIXED,
)
from vqvae_from_gaussian_vae_tpu.evaluations.fvd import compute_fvd


# ---- torch oracle (pytorch-i3d semantics) --------------------------------

def _same_pad(size, kernel, stride):
    out = -(-size // stride)
    pad = max((out - 1) * stride + kernel - size, 0)
    return pad // 2, pad - pad // 2


def _pad_same(x, kernel, stride):
    # x: (N, C, T, H, W); F.pad takes dims last-first
    pads = []
    for i, (k, s) in enumerate(zip(kernel, stride)):
        pads.append(_same_pad(x.shape[2 + i], k, s))
    (pt, pt2), (ph, ph2), (pw, pw2) = pads
    return F.pad(x, (pw, pw2, ph, ph2, pt, pt2))


class TorchUnit3D(torch.nn.Module):
    def __init__(self, cin, cout, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, use_relu=True, use_bias=False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.use_bn, self.use_relu = use_bn, use_relu
        self.conv3d = torch.nn.Conv3d(cin, cout, kernel, stride, bias=use_bias)
        if use_bn:
            self.bn = torch.nn.BatchNorm3d(cout, eps=1e-3)

    def forward(self, x):
        x = self.conv3d(_pad_same(x, self.kernel, self.stride))
        if self.use_bn:
            x = self.bn(x)
        return F.relu(x) if self.use_relu else x


def _torch_maxpool_same(x, kernel, stride):
    return F.max_pool3d(_pad_same(x, kernel, stride), kernel, stride)


class TorchInceptionModule(torch.nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.b0 = TorchUnit3D(cin, c[0])
        self.b1a = TorchUnit3D(cin, c[1])
        self.b1b = TorchUnit3D(c[1], c[2], (3, 3, 3))
        self.b2a = TorchUnit3D(cin, c[3])
        self.b2b = TorchUnit3D(c[3], c[4], (3, 3, 3))
        self.b3b = TorchUnit3D(cin, c[5])

    def forward(self, x):
        b0 = self.b0(x)
        b1 = self.b1b(self.b1a(x))
        b2 = self.b2b(self.b2a(x))
        b3 = self.b3b(_torch_maxpool_same(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([b0, b1, b2, b3], dim=1)


class TorchI3D(torch.nn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = TorchUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TorchUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TorchUnit3D(64, 192, (3, 3, 3))
        ins = {"Mixed_3b": 192, "Mixed_3c": 256, "Mixed_4b": 480,
               "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 512,
               "Mixed_4f": 528, "Mixed_5b": 832, "Mixed_5c": 832}
        for name, cin in ins.items():
            setattr(self, name, TorchInceptionModule(cin, _MIXED[name]))
        self.logits = TorchUnit3D(1024, num_classes, use_bn=False,
                                  use_relu=False, use_bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = _torch_maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = _torch_maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = _torch_maxpool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, name)(x)
        x = _torch_maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = F.avg_pool3d(x, (2, 7, 7), (1, 1, 1))
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))  # (N, 400)


def _random_bn_stats(model):
    # non-trivial running stats so BN conversion is actually exercised
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.fixture(scope="module")
def torch_i3d():
    torch.manual_seed(0)
    model = TorchI3D().eval()
    _random_bn_stats(model)
    return model


def test_i3d_parity_vs_torch_oracle(torch_i3d):
    model = InceptionI3d()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 224, 224, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    variables, missing, unexpected = load_i3d_weights(template, torch_i3d.state_dict())
    assert missing == [], missing
    assert unexpected == [], unexpected

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 224, 224, 3), np.float32) * 0.5
    with torch.no_grad():
        ref = torch_i3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 400)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_i3d_param_count_matches_oracle(torch_i3d):
    model = InceptionI3d()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 224, 224, 3)))
    )
    n_flax = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
    n_torch = sum(p.numel() for p in torch_i3d.parameters())
    assert n_flax == n_torch


def test_fvd_runs_end_to_end():
    rng = np.random.default_rng(0)
    real = [rng.standard_normal((2, 9, 64, 64, 3), np.float32) * 0.3 for _ in range(2)]
    fake = [v + 0.5 for v in real]
    fn = make_i3d_feature_fn(resize=True)
    same = compute_fvd(real, real, feature_fn=fn)
    diff = compute_fvd(real, fake, feature_fn=fn)
    assert np.isfinite(diff)
    assert same < 1e-4
    assert diff > same

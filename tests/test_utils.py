"""Utility coverage: config merge/interpolation/dotlist edge cases, the
profiling helpers, and the torch-key path mapper."""

import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.utils.config import (
    _deep_merge,
    apply_dotlist,
    load_config,
    resolve_target,
)
from vqvae_from_gaussian_vae_tpu.utils.profiling import PhaseTimer, StepRate
from vqvae_from_gaussian_vae_tpu.utils.torch_convert import torch_key_to_path


def test_deep_merge_and_dotlist():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": "x"}
    over = {"a": {"b": 2}, "e": 5}
    m = _deep_merge(base, over)
    assert m == {"a": {"b": 2, "c": [1, 2]}, "d": "x", "e": 5}

    cfg = apply_dotlist({"m": {"p": {}}}, [
        "m.p.lr=1e-4", "m.p.flag=true", "m.p.levels=[8,5]", "m.p.name=run",
        "m.p.none=null",
    ])
    p = cfg["m"]["p"]
    assert p["lr"] == 1e-4 and p["flag"] is True
    assert p["levels"] == [8, 5] and p["name"] == "run" and p["none"] is None
    with pytest.raises(ValueError):
        apply_dotlist({}, ["no_equals_sign"])


def test_multibase_merge_and_interpolation(tmp_path):
    (tmp_path / "a.yaml").write_text("model: {x: 1, y: {z: 2}}\nshared: ${model.y}\n")
    (tmp_path / "b.yaml").write_text("model: {x: 9}\n")
    cfg = load_config([str(tmp_path / "a.yaml"), str(tmp_path / "b.yaml")])
    assert cfg["model"]["x"] == 9
    assert cfg["shared"] == {"z": 2}


def test_resolve_target_aliases():
    assert resolve_target("pit.modules.unet.Encoder").startswith("vqvae_from_gaussian_vae_tpu")
    assert resolve_target("optax.adam") == "optax.adam"


def test_torch_key_to_path():
    assert torch_key_to_path("down.0.block.1.conv1.weight") == [
        "down_0", "block_1", "conv1", "weight"
    ]
    assert torch_key_to_path("mid.block_1.norm1.bias") == ["mid", "block_1", "norm1", "bias"]


def test_phase_timer_and_step_rate():
    t = PhaseTimer()
    with t.phase("enc", sync_value=jnp.ones((2,))):
        _ = jnp.ones((4,)) * 2
    with t.phase("enc"):
        pass
    s = t.summary()
    assert "time/enc_ms" in s and s["time/enc_ms"] >= 0

    r = StepRate()
    assert r.tick(8) == 0.0  # first tick has no interval
    assert r.tick(8) > 0.0


def test_convert_state_dict_embedding_param():
    """torch nn.Embedding `<name>.weight` must land on a flax param whose
    leaf IS the parent path (the VQ codebook, quantization/vq.py:36) —
    regression for the silent random-codebook import (ADVICE r1)."""
    import jax
    import torch

    from vqvae_from_gaussian_vae_tpu.quantization.vq import VQQuantizer
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    q = VQQuantizer(format="bchw", n=32, dim=4)
    template = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 4)))["params"]

    emb = torch.nn.Embedding(32, 4)
    sd = {"regularization.embedding.weight": emb.weight.detach()}
    params, missing, unexpected = convert_state_dict(
        sd, {"regularization": template},
        prefix_map={"regularization.": "regularization."},
    )
    assert unexpected == []
    assert missing == []
    np.testing.assert_allclose(
        np.asarray(params["regularization"]["embedding"]),
        emb.weight.detach().numpy(),
        rtol=1e-6,
    )

"""The ultimate e2e parity test: run the reference's own AutoencodingEngine
(its heavy deps stubbed) and this framework's engine on the same config and
the same converted weights - token indices and dequantized reconstructions
must agree."""

import sys
import types

import numpy as np
import pytest
import torch


def _stub(name, **attrs):
    """Register a stub module only when the real package is absent."""
    try:
        __import__(name)
        return sys.modules[name]
    except ImportError:
        pass
    import importlib.machinery

    mod = sys.modules.get(name) or types.ModuleType(name)
    if getattr(mod, "__spec__", None) is None:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    # timm + diffusers stubs shared with the other parity tests
    from tests.test_vit_parity import _install_timm_stub
    from tests.test_hyvae_third_party import _install_diffusers_stub

    _install_timm_stub()
    _install_diffusers_stub()
    setattr(sys.modules["diffusers"], "FluxPriorReduxPipeline", object)

    class LightningModule(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    _stub("pytorch_lightning", LightningModule=LightningModule)
    _stub("torchvision", transforms=types.SimpleNamespace(), utils=types.SimpleNamespace())
    _stub("cv2")
    _stub("huggingface_hub", hf_hub_download=lambda *a, **k: None)
    st = _stub("safetensors", safe_open=lambda *a, **k: None)
    _stub("safetensors.torch", load_file=lambda *a, **k: {})
    st.torch = sys.modules["safetensors.torch"]


def test_reference_engine_end_to_end_parity():
    _install_stubs()
    from pit.models.autoencoder import AutoencodingEngine as TorchEngine

    import jax

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    overrides = [
        "model.params.encoder_config.params.resolution=32",
        "model.params.encoder_config.params.ch=32",
        "model.params.encoder_config.params.ch_mult=[1,2]",
        "model.params.encoder_config.params.attn_resolutions=[16]",
        "model.params.regularizer_config.params.n_samples=1024",
        "model.params.regularizer_config.params.backend=torch",
    ]
    cfg = load_config("/root/reference/configs/sd3unet_gq_0.25.yaml", dotlist=overrides)
    params = dict(cfg["model"]["params"])
    params.pop("ckpt_path", None)

    torch.manual_seed(0)
    tengine = TorchEngine(
        input_key="img",
        eval_only=True,  # skips the loss (whose LPIPS would try to download)
        encoder_config=params["encoder_config"],
        decoder_config=params["decoder_config"],
        regularizer_config=params["regularizer_config"],
        loss_config=params["loss_config"],
    ).eval()

    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"]["regularizer_config"]["params"]["backend"] = "xla"
    jengine = instantiate_from_config(cfg["model"])
    jengine.init_params(jax.random.PRNGKey(0))

    # convert the torch engine's weights into ours
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    sd = tengine.state_dict()
    prefix_map = {"encoder.": "encoder.", "decoder.": "decoder.", "regularization.": "regularization."}
    jparams, missing, unexpected = convert_state_dict(sd, jengine.params, prefix_map=prefix_map)
    assert not missing, missing
    jengine.params = jparams

    x = np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tz, tlog = tengine.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)), return_reg_log=True)
        txhat = tengine.dequant(tlog["indices"])

    jz, jlog = jengine.encode(x, return_reg_log=True)
    j_idx = np.asarray(jlog["indices"]).transpose(0, 3, 1, 2)
    t_idx = tlog["indices"].numpy()
    match = (j_idx == t_idx).mean()
    assert match > 0.99, f"token index match {match}"

    # decode the SAME indices through both engines: reconstructions agree
    jxhat = jengine.dequant(np.asarray(t_idx.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(jxhat), txhat.numpy().transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3
    )
    # quantized latents agree wherever indices agree
    if match == 1.0:
        np.testing.assert_allclose(np.asarray(jz), tz.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_reference_bsqvit_engine_parity():
    """Same chain over the ViT transcoder family (blc format)."""
    _install_stubs()
    from pit.models.autoencoder import AutoencodingEngine as TorchEngine

    import jax

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    overrides = [
        "model.params.encoder_config.params.image_size=32",
        "model.params.encoder_config.params.width=64",
        "model.params.encoder_config.params.layers=2",
        "model.params.encoder_config.params.heads=4",
        "model.params.regularizer_config.params.n_samples=1024",
        "model.params.regularizer_config.params.backend=torch",
    ]
    cfg = load_config("/root/reference/configs/bsqvit_gq_0.25.yaml", dotlist=overrides)
    params = dict(cfg["model"]["params"])
    params.pop("ckpt_path", None)

    torch.manual_seed(0)
    tengine = TorchEngine(
        input_key="img",
        eval_only=True,
        encoder_config=params["encoder_config"],
        decoder_config=params["decoder_config"],
        regularizer_config=params["regularizer_config"],
        loss_config=params["loss_config"],
        clamp_range=params.get("clamp_range"),
    ).eval()

    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"]["regularizer_config"]["params"]["backend"] = "xla"
    jengine = instantiate_from_config(cfg["model"])
    jengine.init_params(jax.random.PRNGKey(0))

    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    jparams, missing, unexpected = convert_state_dict(
        tengine.state_dict(), jengine.params,
        prefix_map={"encoder.": "encoder.", "decoder.": "decoder.",
                    "regularization.": "regularization."},
    )
    assert not missing, missing
    jengine.params = jparams

    x = np.random.default_rng(2).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        _, tlog = tengine.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)), return_reg_log=True)
        txhat = tengine.dequant(tlog["indices"])

    _, jlog = jengine.encode(x, return_reg_log=True)
    match = (np.asarray(jlog["indices"]) == tlog["indices"].numpy()).mean()
    assert match > 0.99, f"token index match {match}"
    jxhat = jengine.dequant(tlog["indices"].numpy())
    np.testing.assert_allclose(
        np.asarray(jxhat), txhat.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=1e-3
    )

"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

This is the TPU-world analog of a gloo fake cluster (SURVEY.md section 4):
multi-chip sharding logic is exercised on host CPU devices.

Note: this machine's environment pins JAX_PLATFORMS=axon (the TPU plugin)
and the plugin wins over os.environ, so we must override through
jax.config.update *after* import but before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

# make the reference repo importable for parity oracles (read-only)
REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.append(REFERENCE_PATH)

import pytest

# Two-tier suite: modules listed here take minutes each (torch oracles built
# in-process, multihost subprocesses, full train loops); everything else is
# the <5-minute `-m quick` core-parity tier.
HEAVY_MODULES = {
    "test_wan", "test_i3d", "test_multihost", "test_harness", "test_flux",
    "test_hyvae_third_party", "test_engine_reference_parity",
    "test_unet_parity", "test_vit_parity", "test_vit_training",
    "test_tensor_parallel", "test_learning_sanity", "test_train_step",
    "test_fused_train", "test_postprocessor", "test_remat_accum",
    "test_weight_converters", "test_engine_e2e", "test_serve",
    "test_downsample_fused", "test_upsample_fused", "test_fused_resblock",
    "test_metrics", "test_vf_branch", "test_parity_runbook",
    "test_flux_ip_adapter", "test_eval_multihost",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        tier = "heavy" if module in HEAVY_MODULES else "quick"
        item.add_marker(getattr(pytest.mark, tier))

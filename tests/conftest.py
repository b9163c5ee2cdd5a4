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

# GVQ_TEST_TPU=1 runs the suite on the real chip instead (single device;
# the TPU-only parity tests un-skip, the Pallas kernels run real Mosaic).
# Parity oracles are written against exact fp32 math, so the on-chip run
# pins strict matmul precision (the reference's TF32-off analog,
# main.py --matmul_precision highest) — at the TPU default, fp32
# convs/dots run one bf16 pass and every fp32 comparison drifts.
if os.environ.get("GVQ_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_default_matmul_precision", "highest")

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

# individual slow tests inside otherwise-quick modules (measured >30 s each
# on the 8-device CPU mesh; demoted to keep `-m quick` inside its 5-minute
# promise — the quick tier measured 7m49s with them, ~4m40s without)
HEAVY_TESTS = {
    "test_bench_supervisor.py::test_total_failure_emits_staged_sentinel",
    "test_losses.py::test_loss_dtype_knob_keeps_params_fp32",
    "test_losses.py::test_visualize_disc_logits_zero_size_logit_map",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        tail = item.nodeid.rsplit("/", 1)[-1]
        module = tail.split("::")[0].removesuffix(".py")
        base_id = tail.split("[")[0]
        tier = ("heavy" if module in HEAVY_MODULES or base_id in HEAVY_TESTS
                else "quick")
        item.add_marker(getattr(pytest.mark, tier))

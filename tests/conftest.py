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

"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

This is the TPU-world analog of a gloo fake cluster (SURVEY.md section 4):
multi-chip sharding logic is exercised on host CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

# make the reference repo importable for parity oracles (read-only)
REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.append(REFERENCE_PATH)

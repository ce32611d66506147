"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on ``xla_force_host_platform_device_count=8`` CPU devices, the JAX analogue
of a fake multi-device backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("AKI_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env var alone does not beat the preinstalled axon PJRT plugin; the
# config update does.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# fp32 oracles must not silently run bf16 matmuls (the production compute
# path passes bf16 inputs explicitly, so this does not mask policy bugs).
jax.config.update("jax_default_matmul_precision", "highest")

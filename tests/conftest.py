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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU collectives CHECK-fail (SIGABRT, killing the whole pytest run)
# when a participant misses the rendezvous for 40 s. On a 1-core CI host
# running 8 virtual devices, one straggler device program under external
# load can legitimately take that long to be scheduled — observed as a
# flaky `F rendezvous.cc:127 Termination timeout for collective permute`
# abort in the sharded train-step tests (~1 in 3 under host contention).
# Raise warn/terminate to 120/1800 s: a real deadlock still dies, a
# time-sliced straggler doesn't take down CI. (600 s proved insufficient
# on the 1-core bench host: the heaviest sharded train-step test aborted
# mid-suite under concurrent load — same test passes in isolation and in
# a 3-test repro, so this is scheduling starvation, not a deadlock.)
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env var alone does not beat the preinstalled axon PJRT plugin; the
# config update does.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# fp32 oracles must not silently run bf16 matmuls (the production compute
# path passes bf16 inputs explicitly, so this does not mask policy bugs).
jax.config.update("jax_default_matmul_precision", "highest")

"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a forced 8-device CPU platform (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before the first jax import, hence top of conftest.

On-hardware lane: PHE_TPU_TEST_PLATFORM=tpu skips the CPU pin and runs the
whole suite against the real chip (compiled Mosaic kernels, the RNS engine
as the default) — slow over a tunnelled TPU, but the lane that catches
Mosaic lowering regressions the interpret-mode twins cannot.
"""

import os

_PLATFORM = os.environ.get("PHE_TPU_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon TPU plugin in this environment force-prepends itself to
# jax_platforms regardless of the env var; override after import so tests
# never pay remote-TPU compile latency (unless the TPU lane is requested).
import jax

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

import random

import pytest


@pytest.fixture(autouse=True)
def _seed_prng():
    # Keygen in tests uses the random module only through ntheory's
    # Miller-Rabin witnesses; seeding keeps failures reproducible.
    random.seed(1234567)

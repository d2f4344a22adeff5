"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; see __graft_entry__.dryrun_multichip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize registers the remote-TPU relay backend and forces
# jax_platforms="axon,cpu" programmatically (overriding the env var), which
# would route every test dispatch through the network relay.  Re-force CPU
# after that registration; backends are not initialized yet at this point.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound on CPU otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/superodom_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

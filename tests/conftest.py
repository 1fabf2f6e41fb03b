"""Test harness configuration.

Tests run on a CPU backend with 8 virtual devices so that multi-chip sharding
(mesh/pjit/shard_map paths) is exercised without TPU pod hardware, mirroring the
strategy mandated by SURVEY.md section 4. Float64 is enabled globally: the
reference workflow (reference solve.py:285, tol=1e-8) requires f64 accuracy for
convergence parity.
"""

import os

# NOTE: the TPU-tunnel env cleanup + re-exec lives in
# mpbp_tpu/_pytest_plugin.py (loaded via addopts before pytest's capture
# starts). By the time this conftest is imported the env is already clean.

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# Tiny distinct stencil ops dominate test time through XLA compiles; the
# persistent cache makes re-runs ~20x faster.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mesh8():
    """An 8-device 1-D mesh for sharding tests."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=("x",))

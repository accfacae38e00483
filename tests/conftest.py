"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip hardware is unavailable in CI; sharding tests run against
xla_force_host_platform_device_count=8 (see SURVEY.md §2d).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

# The sandbox's sitecustomize imports jax at interpreter boot (with
# JAX_PLATFORMS=axon latched) and registers a remote-TPU PJRT plugin whose
# backend init blocks ~minutes on a network handshake. Force CPU via
# jax.config (env is too late) and unregister the plugin.
try:
    import jax
    import jax._src.xla_bridge as _xb

    jax.config.update("jax_platforms", "cpu")
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

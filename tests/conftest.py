"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device simulation (same SPMD partitioner). Env vars are
not enough here — this image's sitecustomize registers a TPU plugin at
interpreter start — so we force the platform through jax.config before any
backend initialization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

try:  # no-op if the backend is already initialized (e.g. by a plugin)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover
    pass

# Persistent compile cache: first full run is slow on this box; re-runs are
# not. Repo-local so it survives into the driver environment (utils/jax_cache).
from paif_tpu.utils.jax_cache import configure_compile_cache  # noqa: E402

configure_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

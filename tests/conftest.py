"""Test configuration: CPU backend with 8 virtual devices (SURVEY §4).

Multi-device tests exercise the mesh/collectives without real TPUs via
XLA_FLAGS=--xla_force_host_platform_device_count=8.  A persistent
compilation cache keeps repeat runs fast on the small CI host.
"""

import os

# Hard override: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter startup (axon TPU
# plugin), so env vars alone are too late: force the platform via config and
# re-initialize backends so XLA_FLAGS (8 virtual CPU devices) takes effect.
jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jb  # noqa: E402

_jb.clear_backends()

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# Tiny model config used across tests: keeps CPU compile times sane while
# exercising every block (all dims divisible by num_heads=2).
TINY = dict(num_classes=2, filters=(4, 8, 12, 16, 24), num_heads=2)
TINY_HW = 32

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

# NO persistent compilation cache for CPU tests: XLA:CPU's AOT
# serialize/load path segfaults on this CI host family after ~90 in-process
# compilations (cpu_aot_loader logs target-machine feature mismatches such
# as '+prefer-no-scatter', then SIGSEGVs in load — observed deterministically
# with both stale AND freshly-written caches). Cold compiles are slower but
# correct; the TPU-side perf scripts keep their own cache.
jax.config.update("jax_enable_compilation_cache", False)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# torch's OpenMP pool clashing with XLA:CPU's thread pool segfaults the
# full suite on single-core hosts (deterministically around the 90th test);
# pin torch to one thread before any test imports it.
try:
    import torch  # noqa: E402

    torch.set_num_threads(1)
except ImportError:  # torch is baked into the image, but stay safe
    pass


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop jit caches between test modules.

    XLA:CPU segfaults inside backend_compile_and_load once ~90 compiled
    executables are live in one process (reproduced deterministically on
    this host family with and without the persistent cache; crash stack is
    always jax/_src/compiler.py:362). Bounding live executables to one
    module's worth avoids the crash; recompiles across modules are already
    the norm since modules compile distinct functions.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# Tiny model config used across tests: keeps CPU compile times sane while
# exercising every block (all dims divisible by num_heads=2).
TINY = dict(num_classes=2, filters=(4, 8, 12, 16, 24), num_heads=2)
TINY_HW = 32

"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
an 8-device virtual CPU backend per the multi-host test strategy
(SURVEY.md §4d).  Numeric-tolerance tests also assume CPU float32 — TPU
matmul precision would blow their comparison bands.

The environment may boot the axon TPU PJRT backend at interpreter start
(sitecustomize hook), before any conftest runs — in that case the env-var
route (JAX_PLATFORMS / XLA_FLAGS) is too late, so we forcibly re-point an
already-initialized JAX at a fresh 8-device CPU backend below.
"""
import os

# Env-var route: effective when JAX has not initialized yet, and inherited
# by any subprocesses tests spawn.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def _force_cpu_mesh():
    import jax

    if jax.config.jax_platforms == "cpu" and jax.device_count() == 8:
        return
    # Already initialized on another backend (or with 1 CPU device):
    # re-point at a fresh 8-device CPU client.  Internals are
    # version-sensitive (validated on jax 0.9); fail loudly if they move.
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb
    xb.get_backend.cache_clear()
    xb._clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)
    assert jax.default_backend() == "cpu" and jax.device_count() == 8, (
        "failed to re-point JAX at an 8-device CPU backend; "
        "run pytest with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")


_force_cpu_mesh()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles several hundred XLA CPU programs; keeping them
    all loaded eventually segfaults LLVM's JIT inside
    ``backend_compile_and_load`` (reproducible at the same test ~110
    programs in, regardless of machine load — run standalone the same test
    passes).  Dropping the caches between modules bounds resident JIT code
    at the cost of recompiling the handful of shared solver programs.
    """
    yield
    import jax

    jax.clear_caches()

import os

# Tests run on CPU with a virtual 8-device mesh for sharding tests.
# The session env pins JAX_PLATFORMS=axon (tunneled TPU, reserved for
# bench.py), and sitecustomize pre-imports jax with that backend registered,
# so setting the env var alone is too late — also update the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

import hypatia_tpu  # noqa: E402,F401  (enables x64)


import pytest  # noqa: E402

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _global_periodic_cache_clear():
    """The XLA CPU client intermittently segfaults inside
    backend_compile when one process has accumulated hundreds of compiled
    programs (observed in xdist workers running many solver configs).
    Dropping compiled state every few tests keeps each worker well under
    the crash threshold; re-compiles are seconds on CPU."""
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 10 == 0:
        jax.clear_caches()

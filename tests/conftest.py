"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the JAX equivalent of
multi-node simulation; the reference has no distributed tests at all —
SURVEY.md §4).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
(the remote-TPU tunnel) before pytest starts, so plain env vars are too late —
we must update the live jax config. XLA_FLAGS is still read lazily at backend
initialization, so forcing the host device count here works as long as no
test module triggers backend init at import time.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Bound XLA:CPU native state across the suite.

    Full-suite runs (~140 tests, hundreds of compiled programs in one
    process) hard-crashed (SIGSEGV/SIGABRT) in XLA:CPU native code —
    sometimes during a compile, sometimes during a compile-cache read —
    always once enough programs had accumulated; every half-suite subset
    passes. Dropping jax's in-process executable caches between modules
    keeps the native footprint bounded; recompiles are served from the
    persistent compile cache, so the cost is small.
    """
    yield
    import jax
    jax.clear_caches()

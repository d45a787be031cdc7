"""Test environment: CPU with 8 virtual devices (SURVEY.md §4.2.3).

Every shard_map/distributed path is exercised on a forced 8-device CPU mesh;
Pallas kernels run in interpret mode.  The sandbox's sitecustomize registers
the axon TPU backend at interpreter start (before conftest), so env vars
alone can't select CPU — we flip jax_platforms via jax.config and clear the
backend cache instead.  Set MCAX_TEST_PLATFORM=tpu to run the suite on the
real chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default kernel backend for tests: pure-jnp (xla). Pallas-specific tests
# opt in via monkeypatch of MCAX_BACKEND + MCAX_PALLAS_INTERPRET.
os.environ.setdefault("MCAX_BACKEND", "xla")

if os.environ.get("MCAX_TEST_PLATFORM", "cpu") == "tpu":
    # On-chip lane: Mosaic compiles over the tunneled backend take minutes
    # per kernel; the persistent compile cache (utils/cache.py) makes
    # lane reruns start warm.
    from mcax.utils import cache as _cache

    _cache.enable()

if os.environ.get("MCAX_TEST_PLATFORM", "cpu") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    from jax._src import xla_bridge as _xb

    jax.config.update("jax_platforms", "cpu")
    _xb._clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()

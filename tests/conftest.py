"""Test configuration: run everything on a local CPU backend with a
virtual 8-device mesh.

The container preloads an `axon` PJRT plugin via sitecustomize that
(a) force-sets ``jax_platforms="axon,cpu"`` and (b) tunnels every XLA
compilation on the axon backend to a remote compile service (~1s+ per
computation).  Unit tests need a genuinely local CPU, so we override
the platform config back to plain ``cpu`` before any computation runs.
(The env var alone is not enough — register() sets the config
explicitly, which takes precedence over JAX_PLATFORMS.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Workaround: clear in-process executable caches between test
    modules — the preloaded axon PJRT plugin's CPU compile path has
    shown stale-executable buffer-count mismatches when many distinct
    jits accumulate in one process."""
    yield
    jax.clear_caches()

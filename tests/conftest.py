"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware.

NOTE: on this machine the axon TPU plugin preloads `jax` at interpreter
startup, so setting JAX_PLATFORMS/JAX_PLATFORM_NAME inside the process is too
late. `jax.config.update('jax_platforms', ...)` still works because the
backend itself initializes lazily — as does XLA_FLAGS, which the CPU client
reads at client-creation time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect a virtual 8-device CPU mesh"

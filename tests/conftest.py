"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (SURVEY.md §4 strategy)."""

import os

# Force CPU: the session env may pin JAX_PLATFORMS to a (slow, remote) TPU
# tunnel, and a sitecustomize may have imported jax already — so updating
# os.environ alone is not enough; jax.config.update works as long as no
# backend has been initialized yet.  Set STRAINSCAN_TEST_TPU=1 to run the
# suite against real hardware instead.
if not os.environ.get("STRAINSCAN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

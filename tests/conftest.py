"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a fake 8-device CPU mesh
(``--xla_force_host_platform_device_count``), the idiomatic JAX
substitute for real multi-chip hardware in CI.

The environment pre-imports jax and registers a TPU platform at
interpreter start (sitecustomize), so the env var alone is not enough:
``jax.config.update('jax_platforms', ...)`` is required to re-select the
backend in-process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

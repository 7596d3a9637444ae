"""Test configuration: CPU backend with 8 virtual devices (the "fake
backend" for multi-chip sharding tests) and float64 enabled for numeric
parity against the reference's f64 pipeline (SURVEY.md §4).

NOTE: the container's sitecustomize imports jax and registers the remote TPU
('axon') PJRT plugin before pytest starts, so env vars alone are not enough —
we must also flip the already-imported jax config to CPU."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "True"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

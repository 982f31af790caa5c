"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU execution is exercised by
bench.py / the driver.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
forces ``jax_platforms="axon,cpu"`` via jax.config at interpreter start, so
the JAX_PLATFORMS env var alone is not enough — we re-override through
jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-session operating-point floors (deselect with -m 'not slow')")

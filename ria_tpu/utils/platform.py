"""Backend/platform selection for tools and the CLI.

This environment's ``sitecustomize`` registers a remote 'axon' TPU platform
and pins ``jax_platforms="axon,cpu"`` through ``jax.config`` at interpreter
start, so the plain ``JAX_PLATFORMS`` env var is silently ignored.  Session
level tools (protocol simulators, sweeps) are latency-bound — thousands of
small per-tick dispatches — and run orders of magnitude faster on the local
CPU backend than over the TPU tunnel, while array-throughput benches
(bench.py, pallas_bench) want the real chip.

``apply_platform()`` honours, in priority order, an explicit argument and
the ``RIA_PLATFORM`` env var, by re-overriding ``jax_platforms`` before the
backend is initialised (same mechanism as tests/conftest.py).
"""

from __future__ import annotations

import os


def apply_platform(platform: str | None = None) -> str | None:
    """Force the JAX platform if requested. Must run before backend init."""
    plat = platform or os.environ.get("RIA_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu" and "host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip()
    return plat

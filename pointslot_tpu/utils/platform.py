"""JAX platform selection that actually sticks.

Some deployments preload a TPU PJRT plugin at interpreter start (a
sitecustomize hook) and pin ``JAX_PLATFORMS`` in the ambient environment.
In that setup a shell-level ``JAX_PLATFORMS=cpu`` prefix is NOT enough —
backend selection must also be flipped through ``jax.config`` before the
first backend use, or the first ``jax`` call dials the accelerator anyway
(and blocks when it is unreachable). The test suite does this in
tests/conftest.py; entry points call :func:`force_platform`.
"""

from __future__ import annotations

import os


def force_platform(name: str | None) -> None:
    """Pin JAX to platform ``name`` ("cpu", "tpu", "axon", ...). No-op when
    ``name`` is falsy or "auto". Must run before the first jax backend use."""
    if not name or name == "auto":
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)

"""Process-wide device-mesh policy.

The reference is a single-process system; its only concurrency is
pthreads (SURVEY.md §2d). Here the heavy map-level solves — global bundle
adjustment and the essential-graph optimization — route through the
distributed engines (parallel/dist_ba.py, parallel/dist_pg.py) whenever
more than one accelerator is attached, with no configuration required:
``default_mesh()`` lazily builds one mesh over every visible device and
the SLAM layer asks for it at solve time. On a single chip the local
engines are used (same math — see solvers/local_ba.py).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from pointslot_tpu.parallel.mesh import make_mesh

_MESH: Optional[Mesh] = None
_MESH_BUILT = False


def default_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """The all-devices mesh, or None when running on a single device."""
    global _MESH, _MESH_BUILT
    if not _MESH_BUILT:
        devs = jax.devices()
        _MESH = make_mesh(len(devs)) if len(devs) >= min_devices else None
        _MESH_BUILT = True
    return _MESH


def reset_default_mesh():
    """Drop the cached mesh (tests that change the device topology)."""
    global _MESH, _MESH_BUILT
    _MESH = None
    _MESH_BUILT = False

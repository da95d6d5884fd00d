"""Device-mesh helpers for multi-chip SLOT.

The reference has no distributed backend at all (SURVEY.md §2d) — its
parallelism is 4 pthreads + fork-join extraction threads. Here scaling is
native: a jax.sharding.Mesh with two logical axes:

- ``dp`` (data/frame parallel): batches of frames shard their frontend
  (pyramid/FAST/descriptor/stereo) across devices.
- ``ep`` (object parallel — the "expert" analog): independent object tracks
  shard their pose solves; the reference's per-object serial loop
  (src/Tracking.cc:2288-2466) becomes one sharded batched LM.

Bundle adjustment shards its edge set over BOTH axes flattened (the
sequence-parallel analog along the keyframe/observation axis) and reduces
per-block Hessian contributions with psum — a distributed Schur reduction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("dp", "ep")) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        # favor a balanced 2D mesh: dp gets the larger factor
        ep = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                ep = f
                break
        shape = (n // ep, ep)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    return Mesh(np.asarray(devs).reshape(shape), axis_names)

"""Per-stage timing registry + metric counters.

The reference has only ad-hoc std::chrono pairs (mostly commented out,
reference src/Tracking.cc:1040/1089-1092, stereo_kitti.cc:151-160 median
print at exit) and cout-based logging with ANSI color macros
(include/Parameters.h:19-35). Here: a process-wide registry of named
timers (context managers) and counters, dumped as one JSON blob, plus an
optional jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class Profiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: Dict[str, list] = defaultdict(list)
        self.counters: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def timer(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def count(self, name: str, value: float = 1.0):
        if self.enabled:
            self.counters[name] += value

    def summary(self) -> dict:
        import numpy as np

        out = {"counters": dict(self.counters), "stages": {}}
        for name, samples in self.times.items():
            a = np.asarray(samples)
            out["stages"][name] = {
                "n": len(a),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "median_ms": float(np.median(a) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
            }
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=1)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    def reset(self):
        self.times.clear()
        self.counters.clear()


# process-wide default registry
PROFILER = Profiler()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Wrap a region with the JAX profiler (TensorBoard trace)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

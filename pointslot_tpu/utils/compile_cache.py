"""Persistent XLA compilation cache.

The SLOT pipeline's jitted programs (frontend, fused track step, BA
engine) are large; first-compile on a TPU host costs tens of seconds to
minutes. Enabling JAX's persistent compilation cache makes every process
after the first start hot — the equivalent startup cost in the reference
is the one-time 140 MB vocabulary load (reference src/System.cc:79),
whereas its kernels are precompiled C++.

Opt-in helper; callers (run.py, bench.py) invoke it before building any
jitted module. Safe on backends that do not support serialization — JAX
just skips caching.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/pointslot_xla``). Returns the directory used."""
    import jax

    d = cache_dir or os.environ.get(
        "POINTSLOT_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pointslot_xla"),
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything, even fast compiles — the tunnel round-trip is the
    # cost being avoided, not local compile CPU
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d

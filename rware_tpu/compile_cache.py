"""Persistent XLA compilation cache wiring.

The default training path's whole-phase update kernel and the large collect
programs cost minutes of cold compile per (B, T, E, M, schedule) tuple on
this backend (BASELINE.md "Compile times"); without a persistent cache every
NEW PROCESS pays it again.  jax ships a disk-backed executable cache keyed
on the serialized HLO + compile options — pointing it at a stable directory
makes the second process's compile a deserialization instead.

Call :func:`enable_persistent_cache` before building any jitted program
(train.py / bench.py / the measurement tools do this at startup).  Opt out
with ``RWARE_TPU_NO_CACHE=1``; override the location with
``RWARE_TPU_CACHE_DIR`` or the ``path`` argument.
"""
from __future__ import annotations

import os
from typing import Optional

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/rware_tpu/xla_cache")


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax at a persistent on-disk compilation cache and drop the
    size/time thresholds so every program (including the small probe jits
    the tools emit) is cached.  Returns the cache dir, or None when
    disabled via RWARE_TPU_NO_CACHE=1."""
    if os.environ.get("RWARE_TPU_NO_CACHE"):
        return None
    import jax

    path = path or os.environ.get("RWARE_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the default thresholds skip sub-second compiles,
    # but on this backend even "fast" compiles pay the remote tunnel RTT
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path

"""Reusable host buffer arena.

This sandbox's first-touch page faults are ~80 µs/4K page, so a fresh
large ``np.zeros`` runs at ~40 MB/s while a warm buffer copies at
~4 GB/s. Hot host paths (batch packing, tile tables) therefore draw
their large arrays from this keyed cache instead of allocating: shape
buckets (`render.batch`) keep the set of distinct shapes tiny, so each
buffer is faulted in once per process and stays warm.

Contract: a buffer returned for a key is INVALIDATED by the next
request for the same key — callers must finish consuming (e.g. copy to
device) before re-requesting. Buffers are zeroed only on first
allocation; callers own any padding they rely on.
"""

from __future__ import annotations

import numpy as np

_CACHE: dict = {}


def get_array(key: str, shape: tuple, dtype) -> np.ndarray:
    """A cached array for (key, shape, dtype); contents are arbitrary
    (previous use) except on first allocation (zeros)."""
    dtype = np.dtype(dtype)
    buf = _CACHE.get(key)
    if buf is None or buf.shape != shape or buf.dtype != dtype:
        buf = np.zeros(shape, dtype)
        _CACHE[key] = buf
    return buf


def clear() -> None:
    _CACHE.clear()

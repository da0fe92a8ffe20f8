"""Device meshes and shardings for the glyph pipeline.

The reference's single parallelism axis is rayon data-parallelism over
the flat (font, block) task list (`/root/reference/src/font/manager.rs:
102-121`). The TPU-native equivalent: glyph batches sharded over a 1-D
``Mesh(('data',))`` with `NamedSharding`; XLA inserts the collectives.
Within a chip, the Pallas grid over (glyph, pixel-tile) is the
fine-grained axis (the reference has no counterpart — its unit of work
is a whole block on one core).

Multi-host: one process per host via `jax.distributed.initialize`
(standard JAX multi-controller over DCN); each host packs and writes
only its own shard's PBFs — the writer-Mutex pattern without any
cross-host traffic. Only fitting gradients cross hosts (`models/
fitting.py`), riding ICI/DCN through the `psum` XLA emits for
replicated parameters.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (glyph batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad the batch axis so it divides the mesh size (padding rows are
    zeros — glyph metas with w·h = 0 are skipped by the kernels)."""
    n = arr.shape[axis]
    rem = n % multiple
    if rem == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, multiple - rem)
    return np.pad(arr, widths)


def shard_batch(mesh: Mesh, *arrays: np.ndarray, axis: str = "data"):
    """device_put a tuple of arrays with their leading axis sharded
    across the mesh (each pre-padded to a multiple of the mesh size)."""
    sh = batch_sharding(mesh, axis)
    n = mesh.devices.size
    out = tuple(
        jax.device_put(pad_to_multiple(np.asarray(a), n), sh) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def initialize_multihost(coordinator: str | None = None, **kw) -> None:
    """Join the multi-controller runtime (no-op for single-process).

    On a real multi-host slice each host calls this before building the
    mesh; `jax.devices()` then spans the slice and `make_mesh` shards
    over every chip. See module docstring for the host-local I/O rule.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)

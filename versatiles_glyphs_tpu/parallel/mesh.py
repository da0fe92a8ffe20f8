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

import functools

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


def data_mesh(min_devices: int = 2) -> Mesh | None:
    """The production render mesh: every device of the effective default
    platform, or None when there's nothing to shard over (single
    device). This is what `render.driver.Renderer` consults — the
    TPU-native stand-in for the reference's rayon pool size
    (`/root/reference/src/font/manager.rs:117-121`)."""
    from ..utils.device import default_platform

    try:
        devices = jax.devices(default_platform())
    except RuntimeError:
        return None
    if len(devices) < min_devices:
        return None
    return make_mesh(devices)


def sharded_pts_render_fn(mesh: Mesh, TP: int, L_max: int, use_pallas: bool):
    """See `_sharded_pts_render_fn`; thin wrapper normalizing ``L_max``
    out of the compile cache key on the Pallas branch (which never
    reads it — the kernel windows by its own chunk counts), so a
    changed lane bucket alone cannot force a fresh multi-second XLA
    compile on TPU."""
    return _sharded_pts_render_fn(
        mesh, TP, 0 if use_pallas else L_max, use_pallas
    )


@functools.lru_cache(maxsize=None)
def _sharded_pts_render_fn(mesh: Mesh, TP: int, L_max: int, use_pallas: bool):
    """Compiled D-way data-parallel render over the point-chain layout.

    Returns ``fn(pts_st [D,2,N], words_st [D,Nw], tmT_st [D,8,T]) ->
    [D, T, TP] uint8`` where every leading axis is sharded over the
    mesh's single axis: each device renders its own glyph group —
    the reference's rayon fan-out over the flat block task list
    (`manager.rs:102-121`) mapped onto chips. No collectives: block
    rendering is embarrassingly parallel; results land sharded and the
    host fetches each shard.
    """
    axis = mesh.axis_names[0]
    spec = P(axis)

    if use_pallas:
        from ..ops.sdf_pallas import render_bitmaps_pallas_pts as _render

        def local(pts, words, tmT):
            return _render(pts[0], words[0], tmT[0], TP)[None]
    else:
        from ..ops.sdf_jax import render_bitmaps_pts_jax as _render

        def local(pts, words, tmT):
            return _render(pts[0], words[0], tmT[0].T, TP, L_max)[None]

    # check_vma=False: pallas_call outputs carry no vma annotation, and
    # the body is per-shard-pure (no collectives), so the check is both
    # unsatisfiable and unnecessary.
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_delta_render_fn(
    mesh: Mesh, TP: int, L_max: int, T_pad: int, use_pallas: bool
):
    """See `_sharded_delta_render_fn`; same ``L_max`` cache-key
    normalization as `sharded_pts_render_fn`."""
    return _sharded_delta_render_fn(
        mesh, TP, 0 if use_pallas else L_max, T_pad, use_pallas
    )


@functools.lru_cache(maxsize=None)
def _sharded_delta_render_fn(
    mesh: Mesh, TP: int, L_max: int, T_pad: int, use_pallas: bool
):
    """Compiled D-way data-parallel render over the i8-delta wire
    format (`render.batch.pack_points_delta` per shard, stacked on a
    sharded leading axis): each device decodes its own shard
    (`ops.sdf_pallas.reconstruct_delta` + device-derived tile table)
    and renders it — the multi-chip twin of the single-device default
    transport, halving host→device bytes on tunneled links. Returns
    ``fn(deltas [D,2,N] i8, words [D,Nw] i32, anchors [D,3,K] i32,
    meta [D,G,8] i32) -> [D, T_pad, TP] uint8``."""
    import jax.numpy as jnp

    from ..ops.sdf_pallas import derive_tmeta, reconstruct_delta
    from ..render.metrics import Q16_SCALE

    axis = mesh.axis_names[0]
    spec = P(axis)

    if use_pallas:
        # The PUBLIC single-device entry point (decode + derived tile
        # table + kernel, one jit — inlined when traced here), so the
        # multi-chip path can never silently diverge from it.
        from ..ops.sdf_pallas import render_bitmaps_pallas_delta

        def local(deltas, words, anchors, meta):
            return render_bitmaps_pallas_delta(
                deltas[0], words[0], anchors[0], meta[0], TP, T_pad=T_pad
            )[None]
    else:
        from ..ops.sdf_jax import render_bitmaps_pts_jax

        def local(deltas, words, anchors, meta):
            q = reconstruct_delta(deltas[0], anchors[0])
            pts = q.astype(jnp.float32) * jnp.float32(1.0 / Q16_SCALE)
            tmeta = derive_tmeta(meta[0], TP, T_pad).T
            return render_bitmaps_pts_jax(pts, words[0], tmeta, TP, L_max)[
                None
            ]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)


def initialize_multihost(coordinator: str | None = None, **kw) -> None:
    """Join the multi-controller runtime (no-op when no coordinator is
    given — the single-process case).

    On a real multi-host slice each host calls this BEFORE any other
    JAX use (`jax.distributed.initialize` must precede backend init);
    `jax.devices()` then spans the slice and `make_mesh` shards over
    every chip. See the module docstring for the host-local I/O rule:
    after initialization, `FontManager.render_glyphs` partitions the
    block task list by `jax.process_index()` (`partition_tasks`) so
    every host renders and writes a disjoint file set, and only process
    0 writes the two index JSONs.
    """
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator, **kw)


def partition_tasks(tasks, process_index: int, process_count: int, weights=None):
    """Deterministic per-host partition of the global (font, block) task
    list — the multi-host layer above the per-host device mesh.

    Greedy LPT: tasks sorted by descending ``weights`` (default: glyph
    count) are assigned to the currently lightest host, so host loads
    stay balanced without any cross-host communication (every host
    computes the same partition independently; the reference's rayon
    pool has no multi-process analogue, SURVEY §2.7). With real work
    weights (pixel tiles — `FontManager._host_partition` supplies them)
    the Noto Regular set balances to ≥0.95 mean/max for 2-4 hosts
    (tests/test_balance.py), supporting BASELINE.md's ≥85% scaling
    target. Returns the sub-list for ``process_index``, preserving the
    original relative order. Partitions are disjoint and their union is
    exactly ``tasks``.
    """
    if process_count <= 1:
        return list(tasks)
    if weights is None:
        weights = [len(b) for _, b in tasks]
    order = sorted(range(len(tasks)), key=lambda i: (-weights[i], i))
    loads = [0.0] * process_count
    owner = [0] * len(tasks)
    for i in order:
        h = loads.index(min(loads))
        owner[i] = h
        loads[h] += max(float(weights[i]), 1e-9)
    return [t for i, t in enumerate(tasks) if owner[i] == process_index]

"""Render driver: per-glyph prep + pluggable SDF backends.

The structural equivalent of the reference's `Renderer`
(`/root/reference/src/render/renderer.rs:23-150`) with TPU-shaped
internals: metrics are computed per glyph on the host (f64, exact
integer parity), then whole blocks of glyphs are rendered in one batched
device call.

Backends (reference's precise/dummy modes, plus the device paths):

- ``"tpu"``   — Pallas fused kernel (`ops.sdf_pallas`), interpret-mode
                off-TPU so tests run anywhere.
- ``"jax"``   — pure-JAX batched evaluation (`ops.sdf_jax`).
- ``"exact"`` — float64 NumPy golden path (`ops.sdf_ref`), bit-exact vs
                the reference.
- ``"zeros"`` — structurally-correct empty bitmaps (the reference's
                dummy renderer, `renderer_dummy.rs`), for fast pipeline
                tests.
- ``"auto"``  — "tpu" when a TPU is attached, else "exact".
"""

from __future__ import annotations

import numpy as np

from ..font.entry import FontFileEntry
from ..proto.pbf import PbfGlyph
from .metrics import GlyphPrep, prepare_glyph

_SURROGATE_LO, _SURROGATE_HI = 0xD800, 0xDFFF


class Renderer:
    def __init__(self, backend: str = "auto", transport: str = "auto"):
        if backend == "auto":
            from ..utils.device import on_tpu

            backend = "tpu" if on_tpu() else "exact"
        if backend not in ("tpu", "jax", "exact", "zeros"):
            raise ValueError(f"unknown renderer backend {backend!r}")
        if transport not in ("auto", "i16", "f32"):
            raise ValueError(f"unknown point transport {transport!r}")
        self.backend = backend
        # Device point transport: "i16" (default under "auto") ships
        # fixed-point coordinates at half the f32 bytes — the host↔
        # device pipe is the dominant cost of a render — perturbing
        # output bytes by at most ±1 (see `GlyphPrep.chain16`); "f32"
        # keeps the tighter f32-vs-f64 parity (<0.5% of pixels ±1).
        self.transport = "i16" if transport == "auto" else transport

    # -- per-glyph host prep --------------------------------------------

    def prep_glyph(self, entry: FontFileEntry, codepoint: int) -> GlyphPrep | None:
        """Host metric computation for one codepoint; None when the font
        has no glyph for it (or it is not a valid char — the reference's
        `char::from_u32` filter, `renderer.rs:104`)."""
        if _SURROGATE_LO <= codepoint <= _SURROGATE_HI or codepoint > 0x10FFFF:
            return None
        name = entry.glyph_name(codepoint)
        if name is None:
            return None
        cores = entry.prep_cores
        if cores is not None:
            core = cores.get(name)
            if core is not None:
                # Vectorized font-level prep: metrics + transport caches
                # were computed once for the whole font; codepoints
                # sharing a glyph share the core's arrays.
                return core.make_prep(codepoint)
        rings = entry.outline_rings(name)
        return prepare_glyph(codepoint, rings, entry.units_per_em, entry.hor_advance(name))

    # -- batched bitmap rendering ---------------------------------------

    def render_bitmaps(
        self,
        preps: list[GlyphPrep],
        parallel: bool = True,
        progress=None,
    ) -> list[np.ndarray]:
        """Quantized uint8 bitmaps (flat, Y-flipped, len w·h) for a list
        of non-empty preps.

        ``parallel=True`` (the default) shards the batch across every
        attached device when more than one is present (`parallel.mesh.
        data_mesh`) — the device-mesh equivalent of the reference's
        rayon fan-out (`manager.rs:117-121`); ``False`` forces the
        single-device path (the reference's `--single-thread`).

        ``progress`` is an optional ``callable(n)`` ticked as glyph
        results land (the reference ticks its bar per rendered block,
        `manager.rs:113`)."""
        if not preps:
            return []
        tick = progress or (lambda n: None)
        if self.backend == "zeros":
            out = [np.zeros(p.width * p.height, dtype=np.uint8) for p in preps]
            tick(len(preps))
            return out
        if self.backend == "exact":
            # Native multithreaded path when built; bit-identical numpy
            # fallback otherwise. Chunked so progress moves during the
            # long exact render.
            from ..proto import native

            if native.available():
                out = []
                for i in range(0, len(preps), 512):
                    chunk = preps[i : i + 512]
                    out.extend(native.render_sdf_batch(chunk))
                    tick(len(chunk))
                return out
            from ..ops.sdf_ref import render_sdf_exact

            out = []
            for p in preps:
                out.append(
                    render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
                )
                tick(1)
            return out

        if self.backend == "tpu":
            return self._render_tpu(preps, parallel=parallel, progress=tick)

        # "jax": padded-layout batched path (also the autodiff twin).
        from ..ops.sdf_jax import render_bitmaps_jax
        from .batch import pack_block

        segs, meta, P = pack_block(preps)
        out = np.asarray(render_bitmaps_jax(segs, meta, P, sequential=True))
        tick(len(preps))
        return [out[g, : p.width * p.height].copy() for g, p in enumerate(preps)]

    # SMEM budget per launch (1 MiB total): tile table rows are 32 B
    # (T_BUCKETS caps them at 12288 = 384 KiB) and the point-validity
    # mask costs N/8 bytes, so lanes per launch are capped too.
    _LANES_MAX = 1_500_000  # mask words ≤ ~188 KiB
    _TILES_MAX = 12288

    def _render_tpu(
        self,
        preps: list[GlyphPrep],
        TP: int = 256,
        parallel: bool = True,
        progress=None,
    ) -> list[np.ndarray]:
        """Point-chain device path: per SMEM-sized group, ONE upload
        (8 B/point + 1 validity bit/lane — half the segment-soup bytes,
        and the host↔device pipe is the dominant cost) and ONE kernel
        dispatch over a flat tile table; all groups are dispatched
        before any result is fetched, so uploads overlap compute (see
        `render.batch.pack_points` / `plan_tiles`). On TPU this is the
        Pallas points kernel; elsewhere its bit-equivalent jnp twin
        (the Pallas interpreter is impractically slow off-TPU)."""
        from ..utils.arena import get_array
        from ..utils.device import on_tpu as _on_tpu
        from .batch import N_BUCKETS, S_BUCKETS, bucket, pack_points, plan_tiles

        on_tpu = _on_tpu()
        if on_tpu:
            from ..ops.sdf_pallas import render_bitmaps_pallas_pts
        else:
            from ..ops.sdf_jax import render_bitmaps_pts_jax

        import jax

        # Split i16-incompatible outliers into their own f32 groups so a
        # single oversized glyph doesn't route a whole group (usually the
        # whole run) off the half-bytes transport. Each item carries its
        # original index so results return in input order.
        indexed = list(enumerate(preps))
        if self.transport == "i16":
            main = [(i, p) for i, p in indexed if p.q16_ok]
            aux = [(i, p) for i, p in indexed if not p.q16_ok]
        else:
            main, aux = indexed, []

        # Device-mesh data parallelism: with more than one attached
        # device, shard the batch — one balanced glyph group per device
        # per round, dispatched as ONE sharded call (`parallel.mesh.
        # sharded_pts_render_fn`). The reference's rayon fan-out over
        # the flat block list (`manager.rs:102-121`), mapped onto chips.
        if parallel:
            from ..parallel.mesh import data_mesh

            mesh = data_mesh()
            if mesh is not None and len(preps) >= 2 * mesh.devices.size:
                return self._render_tpu_mesh(
                    mesh, main, aux, len(preps), TP, on_tpu, progress=progress
                )

        def partition(items):
            """SMEM-safe groups (almost always exactly one)."""
            groups: list[list[tuple[int, GlyphPrep]]] = []
            cur: list[tuple[int, GlyphPrep]] = []
            lanes = 0
            tiles = 0
            for i, p in items:
                gl = p.npts
                gt = max(1, -(-(p.width * p.height) // TP))
                if cur and (
                    lanes + gl > self._LANES_MAX or tiles + gt > self._TILES_MAX
                ):
                    groups.append(cur)
                    cur = []
                    lanes = 0
                    tiles = 0
                cur.append((i, p))
                lanes += gl
                tiles += gt
            if cur:
                groups.append(cur)
            return groups

        groups = [(g, self.transport == "i16") for g in partition(main)]
        groups += [(g, False) for g in partition(aux)]

        # Canonical device shapes: every group pads to the same
        # (N_pad, T_pad) so the whole run hits ONE compiled kernel
        # variant — re-tracing the Pallas kernel costs ~0.7 s of host
        # Python per shape (and a cold XLA compile per variant), which
        # dwarfs the few-MB upload padding at the tunnel's upload rate.
        from ..ops.sdf_pallas import WINDOW_LANES

        canon_N = bucket(self._LANES_MAX + 8 * (WINDOW_LANES + 256), N_BUCKETS)
        canon_T = self._TILES_MAX

        pending = []
        for gi, (gitems, want_i16) in enumerate(groups):
            gpreps = [p for _, p in gitems]
            # i16 fixed-point transport for the q16-safe partition; the
            # aux partition ships f32 (both dtypes hit cached jit
            # variants of the same kernel).
            dt = np.int16 if want_i16 else np.float32
            if on_tpu:
                max_npts = max((p.npts for p in gpreps), default=1)
                n_lanes = sum(p.npts for p in gpreps)
                n_pad = canon_N
                if n_lanes + max_npts + WINDOW_LANES + 256 > canon_N:
                    n_pad = None  # oversized outlier: fall back to buckets
                pts, words, meta_all, _ = pack_points(
                    gpreps, N_pad=n_pad, dtype=dt, arena_tag=str(gi)
                )
                tmeta, starts, T_used = plan_tiles(
                    gpreps, meta_all, TP, T_pad=canon_T
                )
            else:
                pts, words, meta_all, _ = pack_points(gpreps, dtype=dt)
                tmeta, starts, T_used = plan_tiles(gpreps, meta_all, TP)
            if on_tpu:
                # Explicit device_put: the committed-transfer path is
                # far faster than passing numpy args through the
                # dispatch (which copies through an unpinned slow path
                # on the tunnel). All uploads come from STABLE arena
                # objects: the runtime re-pins a host buffer's pages at
                # ~45 MB/s on its first upload after any device→host
                # fetch (fetches flush the registration cache), but
                # re-uploads of the same object are ~4 GB/s — so per
                # run only the FIRST group's buffers pay the slow path,
                # provided no fetch interleaves (see the pending loop
                # below). Buffers are keyed per GROUP INDEX: device_put
                # may stage asynchronously from the source, so a later
                # group must never np.copyto into a buffer whose
                # transfer could still be in flight — each group slot
                # is only rewritten on the NEXT RUN, after this run's
                # blocking fetches have retired every upload.
                pts_d = jax.device_put(pts)
                wbuf = get_array(
                    f"driver_words_{gi}_{words.shape[0]}",
                    (words.shape[0],), np.int32,
                )
                np.copyto(wbuf, words)
                words_d = jax.device_put(wbuf)
                tmT = get_array(
                    f"driver_tmT_{gi}_{tmeta.shape[0]}",
                    (8, tmeta.shape[0]), np.int32,
                )
                np.copyto(tmT, tmeta.T)
                out = render_bitmaps_pallas_pts(
                    pts_d, words_d, jax.device_put(tmT), TP
                )
                # Fetch only the used tile prefix (padding tiles are
                # pure fetch cost on the thin tunnel), rounded to 256
                # rows to bound the compiled slice variants. The
                # device→host copy is NOT started here: a fetch
                # invalidates the host-buffer registrations, which
                # would put every later group's upload back on the
                # ~45 MB/s pinning path. Uploads and dispatches for
                # ALL groups complete first; then the async fetches
                # start together and overlap the queued kernels.
                keep = min(tmeta.shape[0], -(-T_used // 256) * 256)
                if keep < tmeta.shape[0]:
                    out = out[:keep]
                pending.append((gitems, starts, out, None))
            else:
                # pack_points leaves lane slack, so the fixed-size
                # dynamic slices never clamp. Fetch immediately: the
                # CPU backend may alias the arena-backed numpy inputs,
                # so they must be consumed before the next pack.
                L_max = bucket(
                    max((int(m) for m in meta_all[:, 4]), default=1), S_BUCKETS
                )
                out = render_bitmaps_pts_jax(pts, words, tmeta, TP, L_max)
                pending.append((gitems, starts, None, np.asarray(out)))

        # Start every group's device→host copy before blocking on the
        # first: the tunnel transfers overlap the still-queued kernels
        # and each other's round-trip latency (~25 ms each).
        for _, _, out, host in pending:
            if host is None:
                out.copy_to_host_async()

        results: list = [None] * len(preps)
        for gitems, starts, out, host in pending:
            if host is None:
                host = np.asarray(out)
            # Views into the fetched host buffer (freshly allocated per
            # group by the fetch, so they stay valid). Placed by
            # original index: the q16/aux partition reordered groups.
            flat_host = host.reshape(-1)
            for g, (i, p) in enumerate(gitems):
                results[i] = flat_host[
                    starts[g] * TP : starts[g] * TP + p.width * p.height
                ]
            if progress is not None:
                progress(len(gitems))
        return results

    def _lpt_rounds(self, items, D: int, TP: int):
        """Balance (index, prep) items across ``D`` devices: greedy
        longest-processing-time bin packing by tile count into ``k·D``
        bins, growing ``k`` until every bin fits the SMEM caps. Returns
        a list of rounds, each a list of D bins (possibly empty)."""

        def tiles(p):
            return max(1, -(-(p.width * p.height) // TP))

        order = sorted(items, key=lambda ip: -tiles(ip[1]))
        k = 1
        while True:
            nb = D * k
            bins: list[list] = [[] for _ in range(nb)]
            loads = [0] * nb
            lanes = [0] * nb
            for i, p in order:
                b = loads.index(min(loads))
                bins[b].append((i, p))
                loads[b] += tiles(p)
                lanes[b] += p.npts
            if max(loads) <= self._TILES_MAX and max(lanes) <= self._LANES_MAX:
                return [bins[r * D : (r + 1) * D] for r in range(k)]
            k += 1

    def _render_tpu_mesh(
        self, mesh, main, aux, n_total: int, TP: int, on_tpu: bool,
        progress=None,
    ) -> list[np.ndarray]:
        """Mesh-sharded render: per round, D point-chain groups are
        packed to identical canonical shapes, stacked on a leading
        device axis, device_put with the batch sharding, and rendered by
        one `shard_map`ped kernel call — each device computes its own
        group, no collectives (block rendering is embarrassingly
        parallel, like the reference's rayon tasks).

        The kernel choice follows the MESH's device platform, not the
        session default: a dryrun builds a virtual-CPU mesh on a
        TPU-attached host, and Pallas must only run on real TPU chips
        (its jnp twin is bit-equivalent elsewhere)."""
        import jax

        use_pallas = on_tpu and mesh.devices.flat[0].platform == "tpu"

        from ..ops.sdf_pallas import WINDOW_LANES
        from ..parallel.mesh import batch_sharding, sharded_pts_render_fn
        from .batch import (
            N_BUCKETS, S_BUCKETS, T_BUCKETS, bucket, pack_points, plan_tiles,
        )

        D = mesh.devices.size
        sh = batch_sharding(mesh)
        results: list = [None] * n_total

        def tiles(p):
            return max(1, -(-(p.width * p.height) // TP))

        for items, want_i16 in ((main, self.transport == "i16"), (aux, False)):
            if not items:
                continue
            dt = np.int16 if want_i16 else np.float32
            for round_bins in self._lpt_rounds(items, D, TP):
                max_lanes = max(
                    (sum(p.npts for _, p in b) for b in round_bins if b),
                    default=1,
                )
                max_npts = max(
                    (p.npts for b in round_bins for _, p in b), default=1
                )
                slack = bucket(max_npts + WINDOW_LANES + 256, S_BUCKETS)
                N_pad = bucket(max(max_lanes + slack, 128), N_BUCKETS)
                max_tiles = max(
                    (sum(tiles(p) for _, p in b) for b in round_bins if b),
                    default=1,
                )
                T_pad = bucket(max_tiles, T_BUCKETS)
                L_max = bucket(max_npts, S_BUCKETS)

                pts_st = np.zeros((D, 2, N_pad), dt)
                words_st = np.zeros((D, N_pad // 32), np.int32)
                tmT_st = np.zeros((D, 8, T_pad), np.int32)
                bin_starts = []
                for d, b in enumerate(round_bins):
                    gp = [p for _, p in b]
                    pts, words, meta, _ = pack_points(
                        gp, N_pad=N_pad, dtype=dt, arena_tag=f"_mesh{d}"
                    )
                    tmeta, starts, _ = plan_tiles(gp, meta, TP, T_pad=T_pad)
                    pts_st[d] = pts
                    words_st[d] = words
                    tmT_st[d] = tmeta.T
                    bin_starts.append(starts)

                pts_d = jax.device_put(pts_st, sh)
                words_d = jax.device_put(words_st, sh)
                tmT_d = jax.device_put(tmT_st, sh)
                fn = sharded_pts_render_fn(mesh, TP, L_max, use_pallas)
                host = np.asarray(fn(pts_d, words_d, tmT_d))
                for d, b in enumerate(round_bins):
                    flat = host[d].reshape(-1)
                    starts = bin_starts[d]
                    for g, (i, p) in enumerate(b):
                        results[i] = flat[
                            starts[g] * TP : starts[g] * TP + p.width * p.height
                        ]
                if progress is not None:
                    progress(sum(len(b) for b in round_bins))
        return results

    # -- block assembly --------------------------------------------------

    @staticmethod
    def assemble_glyphs(preps: list[GlyphPrep], bitmap_iter) -> list[PbfGlyph]:
        """Pair preps with rendered bitmaps (consumed from
        ``bitmap_iter`` for each non-empty prep, in order) into
        PbfGlyph messages."""
        out: list[PbfGlyph] = []
        for p in preps:
            if p.empty:
                out.append(PbfGlyph.empty(p.codepoint, p.advance))
            else:
                bm = next(bitmap_iter)
                out.append(
                    PbfGlyph(
                        id=p.codepoint,
                        bitmap=np.asarray(bm, dtype=np.uint8).tobytes(),
                        width=p.pbf_width,
                        height=p.pbf_height,
                        left=p.pbf_left,
                        top=p.pbf_top,
                        advance=p.advance,
                    )
                )
        return out

    def render_block_glyphs(
        self, glyph_sources: list[tuple[int, FontFileEntry]]
    ) -> list[PbfGlyph]:
        """Render a block: (codepoint, font entry) pairs → PbfGlyphs in
        codepoint order. Mirrors `GlyphBlock::render`
        (`src/font/glyph_block.rs:69-80`) with device batching. (The
        manager normally batches across *all* blocks of a run instead —
        see `FontManager.render_glyphs` — this entry point renders one
        block standalone.)"""
        preps: list[GlyphPrep] = []
        for cp, entry in glyph_sources:
            p = self.prep_glyph(entry, cp)
            if p is not None:
                preps.append(p)

        nonempty = [p for p in preps if not p.empty]
        bitmaps = self.render_bitmaps(nonempty)
        return self.assemble_glyphs(preps, iter(bitmaps))

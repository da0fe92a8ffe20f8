"""Superseded Pallas kernel generations, kept for provenance.

These are the round-1/round-2 production kernels, replaced by the
VMEM-resident point-chain kernel family in `ops.sdf_pallas`
(`_sdf_kernel_tiles_pts` + the i8-delta wire format). They are NOT on
any production dispatch path and the bench does not gate them — they
live here (not in `sdf_pallas`) so the production file carries no
unexercised compiled kernel surface (VERDICT r04 ask 7). Retained
because:

- `render_bitmaps_pallas` (padded [G, P] grid, per-chunk DMA from HBM
  through a double-buffered VMEM scratch) is the simplest
  HBM-streaming formulation — the reference point for the measured
  design walk in `docs/kernel_roofline.md` and the only variant whose
  batch size is bounded by HBM rather than VMEM (glyph batches beyond
  the ~2 M-lane VMEM cap would need this shape again);
- `render_bitmaps_pallas_tiles` (flat tile table + windowed DMA) is
  the intermediate generation whose measured per-tile transfer
  latency motivated the VMEM-resident redesign.

Hardware parity for both is asserted in `tests/test_tpu_hw.py`
(TPU-only). The per-pixel math is identical to the production kernel;
see `ops/sdf_ref.py` for the semantics contract
(`/root/reference/src/render/renderer_precise.rs:33-80`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CUTOFF, SDF_RADIUS
from .sdf_pallas import SC, _BIG


def _sdf_kernel(meta_ref, seg_hbm, out_ref, seg_buf, dma_sem, *, tp: int):
    """meta_ref: [G, 8] i32 scalar-prefetch (x0, y0, w, h, nseg,
    seg_off, _, _); seg_hbm: [4, N] f32 left in HBM (chunks are DMA'd
    through the double-buffered ``seg_buf`` VMEM scratch); out_ref:
    [1, 1, tp//128, 128] f32 tile of the [G, P//tp, tp//128, 128] out."""
    g = pl.program_id(0)
    pt = pl.program_id(1)

    x0 = meta_ref[g, 0]
    y0 = meta_ref[g, 1]
    w = meta_ref[g, 2]
    h = meta_ref[g, 3]
    nseg = meta_ref[g, 4]
    seg_off = meta_ref[g, 5]

    npix = w * h
    base = pt * tp

    @pl.when(base >= npix)
    def _skip():
        out_ref[...] = jnp.zeros((1, 1, tp // 128, 128), jnp.float32)

    @pl.when(base < npix)
    def _compute():
        # Pixel coordinates for the tp sublane rows.
        i = base + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        ws = jnp.maximum(w, 1)
        x = i % ws
        row = i // ws
        y = h - 1 - row
        pxc = x0.astype(jnp.float32) + x.astype(jnp.float32) + 0.5
        pyc = y0.astype(jnp.float32) + y.astype(jnp.float32) + 0.5

        # (pl.cdiv trips int32/int64 promotion under jax_enable_x64.)
        nchunks = jax.lax.div(nseg + jnp.int32(SC - 1), jnp.int32(SC))

        def chunk_dma(slot, c):
            off = pl.multiple_of(seg_off + c * SC, SC)
            return pltpu.make_async_copy(
                seg_hbm.at[:, pl.ds(off, SC)],
                seg_buf.at[slot],
                dma_sem.at[slot],
            )

        chunk_dma(0, 0).start()

        def body(c, carry):
            dmin2, wn = carry
            slot = jax.lax.rem(c, 2)

            # Prefetch the next chunk while this one computes.
            @pl.when(c + 1 < nchunks)
            def _():
                chunk_dma(1 - slot, c + 1).start()

            chunk_dma(slot, c).wait()
            vx = seg_buf[slot, 0:1, :]
            vy = seg_buf[slot, 1:2, :]
            wx = seg_buf[slot, 2:3, :]
            wyr = seg_buf[slot, 3:4, :]

            # Derived components: (1, SC) work, amortized over tp pixels.
            dx = wx - vx
            dy = wyr - vy
            l2 = dx * dx + dy * dy
            l2inv = jnp.where(l2 > 0.0, 1.0 / l2, 0.0)
            dyinv = jnp.where(dy != 0.0, 1.0 / dy, 0.0)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, SC), 1)
            seg_ok = (c * SC + lane) < nseg

            ex = pxc - vx
            ey = pyc - vy
            num = ex * dx + ey * dy
            t = num * l2inv
            tc = jnp.clip(t, 0.0, 1.0)
            qx = ex - tc * dx
            qy = ey - tc * dy
            d2 = qx * qx + qy * qy
            d2 = jnp.where(seg_ok, d2, _BIG)
            dmin2 = jnp.minimum(dmin2, d2)

            up = (vy <= pyc) & (wyr > pyc)
            dn = (vy > pyc) & (wyr <= pyc)
            tcr = ey * dyinv
            cx = vx + tcr * dx
            sign = up.astype(jnp.int32) - dn.astype(jnp.int32)
            hit = (cx <= pxc) & seg_ok & (up | dn)
            wn = wn + jnp.where(hit, sign, 0)
            return dmin2, wn

        dmin2 = jnp.full((tp, SC), _BIG, jnp.float32)
        wn0 = jnp.zeros((tp, SC), jnp.int32)
        dmin2, wn = jax.lax.fori_loop(0, nchunks, body, (dmin2, wn0))

        d = jnp.sqrt(jnp.min(dmin2, axis=1, keepdims=True))
        inside = jnp.sum(wn, axis=1, keepdims=True) != 0
        d = jnp.where(inside, -d, d)

        v = d * jnp.float32(256.0 / SDF_RADIUS) + jnp.float32(CUTOFF)
        n = jnp.clip(255.0 - v, 0.0, 255.0)
        byte = jnp.floor(n + 0.5)
        # (tp, 1) sublane column → the output tile's (tp//128, 128)
        # layout: flat pixel index base+s·128+l lands at [s, l].
        out_ref[...] = byte.reshape(1, 1, tp // 128, 128)


def _sdf_kernel_tiles(tmeta_ref, seg_hbm, out_ref, seg_buf, dma_sem, *, tp: int):
    """Single-launch variant: grid = (T,) over a flat tile table.

    tmeta_ref: [8, T] i32 scalar-prefetch columns ``x0, y0, w, h, nseg,
    seg_off, pix_base, _`` (see `render.batch.plan_tiles`; transposed —
    SMEM pads the minor dim to the 128-lane width, so the table must be
    component-major to stay at 32 B/tile instead of 512); out_ref:
    [1, tp//128, 128] f32 tile of the [T, tp//128, 128] output. The
    math is identical to `_sdf_kernel`; only the pixel base comes from
    the table instead of the grid, so one launch covers glyphs of every
    size with ≤TP−1 pixels of padding each."""
    t = pl.program_id(0)

    x0 = tmeta_ref[0, t]
    y0 = tmeta_ref[1, t]
    w = tmeta_ref[2, t]
    h = tmeta_ref[3, t]
    nseg = tmeta_ref[4, t]
    seg_off = tmeta_ref[5, t]
    base = tmeta_ref[6, t]

    npix = w * h

    @pl.when(base >= npix)
    def _skip():
        out_ref[...] = jnp.zeros((1, tp // 128, 128), jnp.float32)

    @pl.when(base < npix)
    def _compute():
        i = base + jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        ws = jnp.maximum(w, 1)
        x = i % ws
        row = i // ws
        y = h - 1 - row
        pxc = x0.astype(jnp.float32) + x.astype(jnp.float32) + 0.5
        pyc = y0.astype(jnp.float32) + y.astype(jnp.float32) + 0.5

        nchunks = jax.lax.div(nseg + jnp.int32(SC - 1), jnp.int32(SC))

        def chunk_dma(slot, c):
            off = pl.multiple_of(seg_off + c * SC, SC)
            return pltpu.make_async_copy(
                seg_hbm.at[:, pl.ds(off, SC)],
                seg_buf.at[slot],
                dma_sem.at[slot],
            )

        chunk_dma(0, 0).start()

        def body(c, carry):
            dmin2, wn = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < nchunks)
            def _():
                chunk_dma(1 - slot, c + 1).start()

            chunk_dma(slot, c).wait()
            vx = seg_buf[slot, 0:1, :]
            vy = seg_buf[slot, 1:2, :]
            wx = seg_buf[slot, 2:3, :]
            wyr = seg_buf[slot, 3:4, :]

            dx = wx - vx
            dy = wyr - vy
            l2 = dx * dx + dy * dy
            l2inv = jnp.where(l2 > 0.0, 1.0 / l2, 0.0)
            dyinv = jnp.where(dy != 0.0, 1.0 / dy, 0.0)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, SC), 1)
            seg_ok = (c * SC + lane) < nseg

            ex = pxc - vx
            ey = pyc - vy
            num = ex * dx + ey * dy
            tpar = num * l2inv
            tc = jnp.clip(tpar, 0.0, 1.0)
            qx = ex - tc * dx
            qy = ey - tc * dy
            d2 = qx * qx + qy * qy
            d2 = jnp.where(seg_ok, d2, _BIG)
            dmin2 = jnp.minimum(dmin2, d2)

            # Half-open crossing `vy <= py < wy` (up, +1) / `wy <= py <
            # vy` (down, −1) re-expressed as one parity test: the ray
            # crosses iff (vy ≤ py) ≠ (wy ≤ py), upward iff vy ≤ py
            # (`renderer_precise.rs:44-50` semantics, fewer VPU ops).
            c1 = vy <= pyc
            cross = c1 ^ (wyr <= pyc)
            tcr = ey * dyinv
            cx = vx + tcr * dx
            hit = cross & (cx <= pxc) & seg_ok
            sign = jnp.where(c1, jnp.int32(1), jnp.int32(-1))
            wn = wn + jnp.where(hit, sign, 0)
            return dmin2, wn

        dmin2 = jnp.full((tp, SC), _BIG, jnp.float32)
        wn0 = jnp.zeros((tp, SC), jnp.int32)
        dmin2, wn = jax.lax.fori_loop(0, nchunks, body, (dmin2, wn0))

        d = jnp.sqrt(jnp.min(dmin2, axis=1, keepdims=True))
        inside = jnp.sum(wn, axis=1, keepdims=True) != 0
        d = jnp.where(inside, -d, d)

        v = d * jnp.float32(256.0 / SDF_RADIUS) + jnp.float32(CUTOFF)
        n = jnp.clip(255.0 - v, 0.0, 255.0)
        byte = jnp.floor(n + 0.5)
        out_ref[...] = byte.reshape(1, tp // 128, 128)


@functools.partial(jax.jit, static_argnames=("TP", "interpret"))
def render_bitmaps_pallas_tiles(
    flat_segs: jnp.ndarray,
    tmeta: jnp.ndarray,
    TP: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-launch render over a flat tile table (LEGACY generation).

    flat_segs: [4, N] f32 (`render.batch.pack_flat` layout); tmeta:
    [8, T] i32 (`render.batch.plan_tiles`, transposed). Returns
    [T, TP] uint8; a glyph's bitmap is the first w·h bytes from its
    first tile's row (tiles of one glyph are table-contiguous). One
    launch per run = one dispatch + one result fetch, whatever the
    glyph-size mix.
    """
    T = tmeta.shape[1]
    N = flat_segs.shape[1]
    assert TP % 128 == 0, f"TP={TP} must be a multiple of 128"
    assert N % SC == 0, f"N={N} must be a multiple of SC={SC}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, TP // 128, 128), lambda t, tmeta: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, SC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_sdf_kernel_tiles, tp=TP),
        out_shape=jax.ShapeDtypeStruct((T, TP // 128, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=26 * T * TP * 512,
            bytes_accessed=4 * N * 4 + T * TP * 4,
            transcendentals=T * TP,
        ),
    )(tmeta, flat_segs)
    return out.reshape(T, TP).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("P", "TP", "interpret"))
def render_bitmaps_pallas(
    flat_segs: jnp.ndarray,
    meta: jnp.ndarray,
    P: int,
    TP: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Render quantized SDF bitmaps for a packed glyph batch (LEGACY
    padded-grid generation; HBM-streaming, so batch size is bounded by
    HBM rather than VMEM).

    flat_segs: [4, N] f32 (layout of `render.batch.pack_flat`);
    meta: [G, 8] i32 (x0, y0, w, h, nseg, seg_off, _, _); P: padded
    pixel count (multiple of TP); TP: pixels per program (multiple of
    128). Returns [G, P] uint8.
    """
    G = meta.shape[0]
    N = flat_segs.shape[1]
    assert P % TP == 0, f"P={P} must be a multiple of TP={TP}"
    assert TP % 128 == 0, f"TP={TP} must be a multiple of 128"
    assert N % SC == 0, f"N={N} must be a multiple of SC={SC}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, P // TP),
        in_specs=[
            # Flat segment array stays in HBM; the kernel DMAs SC-sized
            # chunks through a double-buffered VMEM scratch, so batch
            # size is bounded by HBM, not VMEM.
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TP // 128, 128), lambda g, p, meta: (g, p, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, SC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_sdf_kernel, tp=TP),
        out_shape=jax.ShapeDtypeStruct((G, P // TP, TP // 128, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=26 * G * P * 512,
            bytes_accessed=4 * N * 4 + G * P * 4,
            transcendentals=G * P,
        ),
    )(meta, flat_segs)
    return out.reshape(G, P).astype(jnp.uint8)

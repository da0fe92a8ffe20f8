"""Pallas TPU kernel: fused per-pixel min-distance + winding + quantize.

The production render path. One kernel invocation renders a batch of
glyphs: grid = (G, pixel_tiles); each program evaluates TP pixels of one
glyph against that glyph's segment soup, looping over lane-sized chunks
of a batch-wide **flat** segment array held in VMEM. This replaces the
reference's per-pixel R-tree query + per-row crossing sweep
(`/root/reference/src/render/renderer_precise.rs:33-80`) with a dense,
embarrassingly parallel masked reduction — the same semantics (see
`ops/sdf_ref.py`), shaped for the VPU and for a thin host↔device pipe:

- segments are stored unpadded as ``[4, N]`` f32 rows ``vx, vy, wx, wy``
  with each glyph's run starting at an SC-aligned offset — ~10× fewer
  bytes shipped than a per-glyph padded layout, and the whole batch
  stays VMEM-resident across the grid (the index map is constant, so
  Mosaic fetches it once);
- derived components (dx, dy, 1/l2, 1/dy) are computed per chunk
  in-kernel — (1, SC) work amortized over TP pixels;
- pixels live on sublanes as a (TP, 1) column; segment rows broadcast
  as (1, SC); the (TP, SC) distance/winding work is fused elementwise
  f32 with running accumulators reduced once per tile;
- the chunk loop bound is dynamic per glyph (``ceil(nseg/SC)`` from a
  prefetched scalar) and pixel tiles beyond ``w·h`` skip compute.

Outputs f32 "bytes" in [0, 255]; the caller casts to uint8.
Quantization matches `renderer_precise.rs:75-79` with round-half-away
as ``floor(x + 0.5)`` (valid since the clamp makes x ≥ 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CUTOFF, SDF_RADIUS

# Segments per chunk (one lane row). Glyph segment runs are SC-aligned
# in the flat array.
SC = 128

_BIG = 3.0e38


# Historical constant of the windowed-DMA kernel design, retained
# because the host packers (`render.batch.pack_points`) and the jnp
# twin size their lane slack with it.
NW = 12
WINDOW_LANES = NW * SC

# Tiles processed per grid program. The Pallas per-program overhead
# (scalar setup + output block switch) measured ~1.2 µs on v5e — at one
# 256-px tile per program that was ~45% of the whole kernel, so each
# program handles BT consecutive tile-table rows.
BT = 4


def _sdf_kernel_tiles_pts(
    tmeta_ref, vx_ref, vy_ref, wx_ref, wy_ref, ok_ref, out_ref, *, tp: int
):
    """Point-chain tile kernel over VMEM-resident restructured points.

    The whole batch's segment data lives in VMEM for the entire grid
    (constant-index-map blocks, fetched once): ``vx/vy/wx/wy_ref`` are
    [M, SC] f32 chunk-row views of the flat lane array (lane ``i`` =
    row ``i//SC``, column ``i%SC``; the w-endpoint arrays are the
    v-arrays lane-shifted by one, materialized once by the XLA prepass
    in `render_bitmaps_pallas_pts`), and ``ok_ref`` [M, SC] f32 is the
    per-lane validity (0 marks ring-end lanes). A chunk iteration is
    four aligned VMEM row loads — no DMA machinery, no per-tile
    transfer latency (the dominant overhead of the previous windowed
    design at ~1 window per tile).

    tmeta_ref: [8, T] i32 scalar-prefetch columns ``x0, y0, w, h, npts,
    off, pix_base, _`` (`render.batch.plan_tiles`, transposed). Each
    program renders BT consecutive tiles (amortizing per-program
    overhead); per glyph the segment soup is the lanes
    [off, off+npts-1), and gating by absolute lane index masks the
    neighbouring glyph's lanes that share the glyph's first/last chunk
    rows.

    Pixel decomposition uses f32 division instead of integer div/mod:
    ``row = floor((i+0.5)/w)`` is exact for ``w·h < 2²³`` (the 0.5
    offset keeps the true quotient ≥ 0.5/w away from every integer
    boundary while the f32 error is ≤ h·2⁻²⁴) — integer div/mod lower
    to multi-instruction sequences that measured ~55% of the whole
    kernel. Tile counts are SMEM-capped far below 2²³ pixels per glyph
    upstream (`render.driver._TILES_MAX`)."""
    b = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SC), 1)
    iota_tp = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)

    for bi in range(BT):
        t = b * BT + bi
        x0 = tmeta_ref[0, t]
        y0 = tmeta_ref[1, t]
        w = tmeta_ref[2, t]
        h = tmeta_ref[3, t]
        npts = tmeta_ref[4, t]
        off = tmeta_ref[5, t]
        base = tmeta_ref[6, t]

        npix = w * h

        @pl.when(base >= npix)
        def _skip(bi=bi):
            out_ref[bi] = jnp.zeros((tp // 128, 128), jnp.float32)

        @pl.when(base < npix)
        def _compute(bi=bi, x0=x0, y0=y0, w=w, h=h, npts=npts, off=off, base=base):
            i = base + iota_tp
            ws = jnp.maximum(w, 1)
            fws = ws.astype(jnp.float32)
            row = jnp.floor((i.astype(jnp.float32) + 0.5) / fws).astype(jnp.int32)
            x = i - row * ws
            y = h - 1 - row
            pxc = x0.astype(jnp.float32) + x.astype(jnp.float32) + 0.5
            pyc = y0.astype(jnp.float32) + y.astype(jnp.float32) + 0.5

            c0 = jax.lax.div(off, jnp.int32(SC))
            rem = off - c0 * SC
            nch = jax.lax.div(
                rem + jnp.maximum(npts - 1, 0) + jnp.int32(SC - 1),
                jnp.int32(SC),
            )
            nch = jnp.maximum(nch, 1)
            last = off + npts - 1  # lanes [off, last) are the segments

            def body(ci, carry):
                dmin, wn = carry
                c = c0 + ci
                vx = vx_ref[pl.ds(c, 1), :]
                vy = vy_ref[pl.ds(c, 1), :]
                wx = wx_ref[pl.ds(c, 1), :]
                wyr = wy_ref[pl.ds(c, 1), :]
                okl = ok_ref[pl.ds(c, 1), :]

                dx = wx - vx
                dy = wyr - vy
                l2 = dx * dx + dy * dy
                l2inv = jnp.where(l2 > 0.0, 1.0 / l2, 0.0)
                dyinv = jnp.where(dy != 0.0, 1.0 / dy, 0.0)

                lane_abs = c * SC + lane
                seg_ok = (okl != 0.0) & (lane_abs >= off) & (lane_abs < last)

                ex = pxc - vx
                ey = pyc - vy
                num = ex * dx + ey * dy
                tpar = num * l2inv
                tc = jnp.clip(tpar, 0.0, 1.0)
                qx = ex - tc * dx
                qy = ey - tc * dy
                d2 = qx * qx + qy * qy
                d2 = jnp.where(seg_ok, d2, _BIG)
                # (tp, SC) running accumulators, reduced ONCE per tile
                # after the loop — the per-chunk cross-lane min/sum
                # reductions they replace are log2(SC)-step lane
                # shuffles each (measured +2%, bit-identical;
                # docs/kernel_roofline.md "instruction-mix attempts").
                dmin = jnp.minimum(dmin, d2)

                c1 = vy <= pyc
                cross = c1 ^ (wyr <= pyc)
                tcr = ey * dyinv
                cx = vx + tcr * dx
                hit = cross & (cx <= pxc) & seg_ok
                sign = jnp.where(c1, jnp.int32(1), jnp.int32(-1))
                wn = wn + jnp.where(hit, sign, 0)
                return dmin, wn

            dmin0 = jnp.full((tp, SC), _BIG, jnp.float32)
            wn0 = jnp.zeros((tp, SC), jnp.int32)
            dmin, wn = jax.lax.fori_loop(0, nch, body, (dmin0, wn0))

            d = jnp.sqrt(jnp.min(dmin, axis=1, keepdims=True))
            inside = jnp.sum(wn, axis=1, keepdims=True) != 0
            d = jnp.where(inside, -d, d)

            v = d * jnp.float32(256.0 / SDF_RADIUS) + jnp.float32(CUTOFF)
            n = jnp.clip(255.0 - v, 0.0, 255.0)
            byte = jnp.floor(n + 0.5)
            out_ref[bi] = byte.reshape(tp // 128, 128)


def _pts_prepass(pts: jnp.ndarray, mask_words: jnp.ndarray):
    """Shared XLA prepass (fused into the caller's jit, one dispatch):
    dequantize, restructure the flat lanes into [M, SC] chunk rows,
    materialize the lane-shifted w-endpoint arrays, and expand the
    validity bits — all at on-device HBM speeds. The kernel then keeps
    everything VMEM-resident across the whole grid."""
    if pts.dtype == jnp.int16:
        from ..render.metrics import Q16_SCALE

        pts = pts.astype(jnp.float32) * jnp.float32(1.0 / Q16_SCALE)
    N = pts.shape[1]
    M = N // SC
    assert N % SC == 0, f"N={N} must be a multiple of SC={SC}"
    assert mask_words.shape == (N // 32,)
    X = pts[0].reshape(M, SC)
    Y = pts[1].reshape(M, SC)
    Xr = jnp.roll(X, -1, axis=0)[:, :1]
    Yr = jnp.roll(Y, -1, axis=0)[:, :1]
    WX = jnp.concatenate([X[:, 1:], Xr], axis=1)
    WY = jnp.concatenate([Y[:, 1:], Yr], axis=1)
    lanes = jnp.arange(N, dtype=jnp.int32)
    bits = jnp.bitwise_and(
        jax.lax.shift_right_logical(
            mask_words[lanes >> 5], jnp.bitwise_and(lanes, 31)
        ),
        1,
    )
    OK = bits.astype(jnp.float32).reshape(M, SC)
    return X, Y, WX, WY, OK


def _launch_pts(X, Y, WX, WY, OK, tmeta, TP: int, interpret: bool):
    """The point-chain tile kernel launch shared by every transport."""
    T = tmeta.shape[1]
    M, _ = X.shape
    N = M * SC
    assert TP % 128 == 0, f"TP={TP} must be a multiple of 128"
    assert T % BT == 0, f"T={T} must be a multiple of BT={BT}"
    resident = pl.BlockSpec((M, SC), lambda b, tmeta: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // BT,),
        in_specs=[resident] * 5,
        out_specs=pl.BlockSpec((BT, TP // 128, 128), lambda b, tmeta: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_sdf_kernel_tiles_pts, tp=TP),
        out_shape=jax.ShapeDtypeStruct((T, TP // 128, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * T * TP * 512,
            bytes_accessed=2 * N * 4 + T * TP * 4,
            transcendentals=T * TP,
        ),
    )(tmeta, X, Y, WX, WY, OK)
    return out.reshape(T, TP).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("TP", "interpret"))
def render_bitmaps_pallas_pts(
    pts: jnp.ndarray,
    mask_words: jnp.ndarray,
    tmeta: jnp.ndarray,
    TP: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-launch render over the point-chain layout.

    pts: [2, N] f32 — or i16 fixed-point (×`metrics.Q16_SCALE`), the
    half-the-bytes wire format (the host↔device pipe is the run's
    dominant cost on a thin tunnel); mask_words: [N//32] i32 validity
    bits; tmeta: [8, T] i32 (`render.batch.plan_tiles` transposed,
    built from pack_points meta; rows 0-6 = x0/y0/w/h/nseg/seg_off/
    pix_base, row 7 reserved-zero). Returns [T, TP] uint8.
    """
    return _launch_pts(*_pts_prepass(pts, mask_words), tmeta, TP, interpret)


def reconstruct_delta(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Decode the i8-delta wire format back to exact q16 i32 positions.

    deltas: [2, N] i8 lane-to-lane diffs of the q16 chain (0 at anchor
    lanes); anchors: [3, K] i32 — row 0 the anchor lane index, rows
    1-2 the true x/y delta there (padding columns (0, 0, 0) are no-op
    adds). One sparse scatter-add (K ≈ 1-3% of N) plus one cumsum
    reconstructs positions **bit-identical** to `GlyphPrep.chain16`,
    so the i16 transport's parity argument carries over unchanged.
    Designed to run inside the caller's jit on device (~1.6 ms for
    1.5 M lanes on v5e) — the wire saving (~2 B/lane) is worth far
    more on a ~35 MB/s host↔device pipe.
    """
    full = deltas.astype(jnp.int32)
    full = full.at[:, anchors[0]].add(anchors[1:3])
    return jnp.cumsum(full, axis=1)


# Standalone-jitted decoder: the off-TPU driver path and tests decode
# the wire format through the exact ops the device jit fuses.
reconstruct_delta_jit = jax.jit(reconstruct_delta)


def derive_tmeta(meta: jnp.ndarray, TP: int, T_pad: int) -> jnp.ndarray:
    """Build the [8, T_pad] tile table on device from the per-glyph
    meta [G, 8] (`render.batch.pack_points` layout) — the table is pure
    derived data, so shipping the ~8× smaller glyph rows and expanding
    at HBM speed saves its upload bytes. Matches
    `render.batch.plan_tiles` row for row over the first T_used rows;
    padding rows (clipped/padded by `jnp.repeat`) land on pix_base ≥
    w·h and are skipped by the kernel."""
    G = meta.shape[0]
    w = meta[:, 2]
    h = meta[:, 3]
    ntiles = jnp.maximum(1, -(-(w * h) // TP))
    starts = jnp.concatenate(
        [jnp.zeros(1, ntiles.dtype), jnp.cumsum(ntiles)[:-1]]
    )
    g_of_tile = jnp.repeat(
        jnp.arange(G, dtype=jnp.int32), ntiles, total_repeat_length=T_pad
    )
    tmeta = meta[g_of_tile].T
    pix_base = (
        jnp.arange(T_pad, dtype=jnp.int32) - starts[g_of_tile]
    ) * jnp.int32(TP)
    return tmeta.at[6].set(pix_base.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("TP", "T_pad", "interpret"))
def render_bitmaps_pallas_delta(
    deltas: jnp.ndarray,
    mask_words: jnp.ndarray,
    anchors: jnp.ndarray,
    meta: jnp.ndarray,
    TP: int = 256,
    T_pad: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-launch render over the i8-delta wire format (the default
    transport): `reconstruct_delta` + `derive_tmeta` + the shared
    point-chain kernel, one dispatch. Inputs are the
    `render.batch.pack_points_delta` arrays; output matches
    `render_bitmaps_pallas_pts` on the same glyphs byte for byte."""
    from ..render.metrics import Q16_SCALE

    q = reconstruct_delta(deltas, anchors)
    pts = q.astype(jnp.float32) * jnp.float32(1.0 / Q16_SCALE)
    tmeta = derive_tmeta(meta, TP, T_pad)
    return _launch_pts(*_pts_prepass(pts, mask_words), tmeta, TP, interpret)


def _sdf_kernel_tiles_pts_min(
    tmeta_ref, vx_ref, vy_ref, wx_ref, wy_ref, ok_ref,
    d2_ref, wn_ref, am_ref, *, tp: int
):
    """Residual variant of `_sdf_kernel_tiles_pts` for the
    differentiable path (`ops.sdf_grad.signed_field_flat`): same
    layout, same math, but instead of quantized bytes it emits the
    per-pixel min-d², winding number, and the **global lane index of
    the first argmin segment** — the only facts the envelope-theorem
    backward needs (the gradient of a hard min flows solely to the
    argmin segment, recomputable in O(P) outside the kernel).

    Tie rule: the smallest lane index among minima (strict-less chunk
    merge keeps the earliest chunk; in-chunk lane min keeps the
    earliest lane). All-masked pixels keep the `_BIGI` sentinel."""
    b = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SC), 1)
    iota_tp = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)

    for bi in range(BT):
        t = b * BT + bi
        x0 = tmeta_ref[0, t]
        y0 = tmeta_ref[1, t]
        w = tmeta_ref[2, t]
        h = tmeta_ref[3, t]
        npts = tmeta_ref[4, t]
        off = tmeta_ref[5, t]
        base = tmeta_ref[6, t]

        npix = w * h

        @pl.when(base >= npix)
        def _skip(bi=bi):
            d2_ref[bi] = jnp.zeros((tp // 128, 128), jnp.float32)
            wn_ref[bi] = jnp.zeros((tp // 128, 128), jnp.int32)
            am_ref[bi] = jnp.zeros((tp // 128, 128), jnp.int32)

        @pl.when(base < npix)
        def _compute(bi=bi, x0=x0, y0=y0, w=w, h=h, npts=npts, off=off, base=base):
            i = base + iota_tp
            ws = jnp.maximum(w, 1)
            fws = ws.astype(jnp.float32)
            row = jnp.floor((i.astype(jnp.float32) + 0.5) / fws).astype(jnp.int32)
            x = i - row * ws
            y = h - 1 - row
            pxc = x0.astype(jnp.float32) + x.astype(jnp.float32) + 0.5
            pyc = y0.astype(jnp.float32) + y.astype(jnp.float32) + 0.5

            c0 = jax.lax.div(off, jnp.int32(SC))
            rem = off - c0 * SC
            nch = jax.lax.div(
                rem + jnp.maximum(npts - 1, 0) + jnp.int32(SC - 1),
                jnp.int32(SC),
            )
            nch = jnp.maximum(nch, 1)
            last = off + npts - 1

            def body(ci, carry):
                dmin, amin, wn = carry
                c = c0 + ci
                vx = vx_ref[pl.ds(c, 1), :]
                vy = vy_ref[pl.ds(c, 1), :]
                wx = wx_ref[pl.ds(c, 1), :]
                wyr = wy_ref[pl.ds(c, 1), :]
                okl = ok_ref[pl.ds(c, 1), :]

                dx = wx - vx
                dy = wyr - vy
                l2 = dx * dx + dy * dy
                l2inv = jnp.where(l2 > 0.0, 1.0 / l2, 0.0)
                dyinv = jnp.where(dy != 0.0, 1.0 / dy, 0.0)

                lane_abs = c * SC + lane
                seg_ok = (okl != 0.0) & (lane_abs >= off) & (lane_abs < last)

                ex = pxc - vx
                ey = pyc - vy
                num = ex * dx + ey * dy
                tpar = num * l2inv
                tc = jnp.clip(tpar, 0.0, 1.0)
                qx = ex - tc * dx
                qy = ey - tc * dy
                d2 = qx * qx + qy * qy
                d2 = jnp.where(seg_ok, d2, _BIG)

                m = jnp.min(d2, axis=1, keepdims=True)
                li = jnp.min(
                    jnp.where(d2 == m, lane_abs, _BIGI), axis=1, keepdims=True
                )
                better = m < dmin
                amin = jnp.where(better, li, amin)
                dmin = jnp.where(better, m, dmin)

                c1 = vy <= pyc
                cross = c1 ^ (wyr <= pyc)
                tcr = ey * dyinv
                cx = vx + tcr * dx
                hit = cross & (cx <= pxc) & seg_ok
                sign = jnp.where(c1, jnp.int32(1), jnp.int32(-1))
                wn = wn + jnp.sum(jnp.where(hit, sign, 0), axis=1, keepdims=True)
                return dmin, amin, wn

            dmin0 = jnp.full((tp, 1), _BIG, jnp.float32)
            amin0 = jnp.full((tp, 1), _BIGI, jnp.int32)
            wn0 = jnp.zeros((tp, 1), jnp.int32)
            dmin, amin, wn = jax.lax.fori_loop(
                0, nch, body, (dmin0, amin0, wn0)
            )

            d2_ref[bi] = dmin.reshape(tp // 128, 128)
            wn_ref[bi] = wn.reshape(tp // 128, 128)
            am_ref[bi] = amin.reshape(tp // 128, 128)


_BIGI = 2147483647  # i32 max; argmin sentinel for all-masked pixels


@functools.partial(jax.jit, static_argnames=("TP", "interpret"))
def min_field_pallas_pts(
    pts: jnp.ndarray,
    mask_words: jnp.ndarray,
    tmeta: jnp.ndarray,
    TP: int = 256,
    interpret: bool = False,
):
    """Min-distance residuals over the point-chain layout.

    Same inputs as `render_bitmaps_pallas_pts` (pts f32 only — this is
    the fitting path, where coordinates are live parameters). Returns
    (dmin2 [T, TP] f32, wn [T, TP] i32, amin [T, TP] i32 global lane
    index, `_BIGI` where no live segment). Skip/padding tiles are
    all-zero in every output."""
    assert pts.dtype == jnp.float32
    T = tmeta.shape[1]
    N = pts.shape[1]
    M = N // SC
    assert TP % 128 == 0, f"TP={TP} must be a multiple of 128"
    assert N % SC == 0, f"N={N} must be a multiple of SC={SC}"
    assert mask_words.shape == (N // 32,)

    X = pts[0].reshape(M, SC)
    Y = pts[1].reshape(M, SC)
    Xr = jnp.roll(X, -1, axis=0)[:, :1]
    Yr = jnp.roll(Y, -1, axis=0)[:, :1]
    WX = jnp.concatenate([X[:, 1:], Xr], axis=1)
    WY = jnp.concatenate([Y[:, 1:], Yr], axis=1)
    lanes = jnp.arange(N, dtype=jnp.int32)
    bits = jnp.bitwise_and(
        jax.lax.shift_right_logical(
            mask_words[lanes >> 5], jnp.bitwise_and(lanes, 31)
        ),
        1,
    )
    OK = bits.astype(jnp.float32).reshape(M, SC)

    assert T % BT == 0, f"T={T} must be a multiple of BT={BT}"
    resident = pl.BlockSpec((M, SC), lambda b, tmeta: (0, 0))
    tile_out = pl.BlockSpec((BT, TP // 128, 128), lambda b, tmeta: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // BT,),
        in_specs=[resident] * 5,
        out_specs=[tile_out] * 3,
    )

    shp = (T, TP // 128, 128)
    d2, wn, am = pl.pallas_call(
        functools.partial(_sdf_kernel_tiles_pts_min, tp=TP),
        out_shape=[
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=34 * T * TP * 512,
            bytes_accessed=2 * N * 4 + 3 * T * TP * 4,
            transcendentals=0,
        ),
    )(tmeta, X, Y, WX, WY, OK)
    return (
        d2.reshape(T, TP),
        wn.reshape(T, TP),
        am.reshape(T, TP),
    )


def default_interpret() -> bool:
    """Pallas TPU kernels need interpret mode off-TPU (tests on CPU)."""
    from ..utils.device import on_tpu

    return not on_tpu()

"""Pallas TPU kernel: fused per-pixel min-distance + winding + quantize.

The production render path. One kernel invocation renders a whole glyph
block: grid = (G, pixel_tiles); each program evaluates TP pixels of one
glyph against that glyph's segment soup, looping over lane-sized segment
chunks held in VMEM. This replaces the reference's per-pixel R-tree
query + per-row crossing sweep
(`/root/reference/src/render/renderer_precise.rs:33-80`) with a dense,
embarrassingly parallel masked reduction — the same semantics (see
`ops/sdf_ref.py`), shaped for the VPU:

- pixels live on sublanes as a (TP, 1) column; segment components are
  (1, SC) lane rows sliced straight out of the packed ``[8, S]`` layout
  (no transposes in the inner loop);
- the (TP, SC) distance/winding work is pure fused elementwise f32;
  running accumulators stay (TP, SC) and reduce over lanes once per
  tile;
- the segment-chunk loop bound is **dynamic per glyph**
  (``ceil(nseg/SC)`` from a prefetched scalar), so padding to the batch
  S_max costs no compute, only memory;
- pixel tiles beyond the glyph's real ``w·h`` skip compute entirely.

Outputs f32 "bytes" in [0, 255]; the caller casts to uint8 (keeping the
kernel's store layout simple). Quantization matches
`renderer_precise.rs:75-79` with round-half-away implemented as
``floor(x + 0.5)`` (valid since the clamp makes x ≥ 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CUTOFF, SDF_RADIUS
from .sdf_jax import DX, DY, DYINV, L2INV, VX, VY, WY

# Pixels per program (sublane-major column) and segments per chunk
# (one lane row). TP must be a multiple of 8 (f32 sublane), SC of 128.
TP = 1024
SC = 128

_BIG = 3.0e38


def _sdf_kernel(meta_ref, seg_ref, out_ref):
    """meta_ref: [G, 8] i32 scalar-prefetch (x0, y0, w, h, nseg, ...);
    seg_ref: [1, 8, S] f32 VMEM block; out_ref: [1, TP] f32."""
    g = pl.program_id(0)
    pt = pl.program_id(1)

    x0 = meta_ref[g, 0]
    y0 = meta_ref[g, 1]
    w = meta_ref[g, 2]
    h = meta_ref[g, 3]
    nseg = meta_ref[g, 4]

    npix = w * h
    base = pt * TP

    @pl.when(base >= npix)
    def _skip():
        out_ref[...] = jnp.zeros((1, TP), jnp.float32)

    @pl.when(base < npix)
    def _compute():
        # Pixel coordinates for the TP sublane rows.
        i = base + jax.lax.broadcasted_iota(jnp.int32, (TP, 1), 0)
        ws = jnp.maximum(w, 1)
        x = i % ws
        row = i // ws
        y = h - 1 - row
        pxc = x0.astype(jnp.float32) + x.astype(jnp.float32) + 0.5
        pyc = y0.astype(jnp.float32) + y.astype(jnp.float32) + 0.5

        nchunks = pl.cdiv(nseg, SC)

        def body(c, carry):
            dmin2, wn = carry
            off = c * SC
            vx = seg_ref[0, VX, pl.ds(off, SC)].reshape(1, SC)
            vy = seg_ref[0, VY, pl.ds(off, SC)].reshape(1, SC)
            dx = seg_ref[0, DX, pl.ds(off, SC)].reshape(1, SC)
            dy = seg_ref[0, DY, pl.ds(off, SC)].reshape(1, SC)
            l2inv = seg_ref[0, L2INV, pl.ds(off, SC)].reshape(1, SC)
            dyinv = seg_ref[0, DYINV, pl.ds(off, SC)].reshape(1, SC)
            wyr = seg_ref[0, WY, pl.ds(off, SC)].reshape(1, SC)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, SC), 1)
            seg_ok = (off + lane) < nseg

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

        dmin2 = jnp.full((TP, SC), _BIG, jnp.float32)
        wn0 = jnp.zeros((TP, SC), jnp.int32)
        dmin2, wn = jax.lax.fori_loop(0, nchunks, body, (dmin2, wn0))

        d = jnp.sqrt(jnp.min(dmin2, axis=1, keepdims=True))
        inside = jnp.sum(wn, axis=1, keepdims=True) != 0
        d = jnp.where(inside, -d, d)

        v = d * jnp.float32(256.0 / SDF_RADIUS) + jnp.float32(CUTOFF)
        n = jnp.clip(255.0 - v, 0.0, 255.0)
        byte = jnp.floor(n + 0.5)
        out_ref[...] = byte.reshape(1, TP)


@functools.partial(jax.jit, static_argnames=("P", "interpret"))
def render_bitmaps_pallas(
    segs: jnp.ndarray, meta: jnp.ndarray, P: int, interpret: bool = False
) -> jnp.ndarray:
    """Render quantized SDF bitmaps for a packed glyph block.

    segs: [G, 8, S] f32 (layout of `render.batch.pack_segments`);
    meta: [G, 8] i32 (x0, y0, w, h, nseg, pad...); P: padded pixel
    count (multiple of TP). Returns [G, P] uint8.
    """
    G, _, S = segs.shape
    assert P % TP == 0, f"P={P} must be a multiple of TP={TP}"
    assert S % SC == 0, f"S={S} must be a multiple of SC={SC}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, P // TP),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda g, p, meta: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP), lambda g, p, meta: (g, p)),
    )

    out = pl.pallas_call(
        _sdf_kernel,
        out_shape=jax.ShapeDtypeStruct((G, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=26 * G * P * S,
            bytes_accessed=G * (8 * S * 4 + P * 4),
            transcendentals=G * P,
        ),
    )(meta, segs)
    return out.astype(jnp.uint8)


def default_interpret() -> bool:
    """Pallas TPU kernels need interpret mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"

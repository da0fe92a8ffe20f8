"""Glyph-batch packing: variable host geometry → fixed device shapes.

TPU compilation wants static shapes; glyph outlines don't have them.
This module bridges the two: a block's glyphs (each with its own segment
count and bitmap size) are packed into padded tensors whose dims are
drawn from a small set of **buckets**, so the whole run compiles a
handful of kernel variants instead of one per block.

- ``segs_packed``: [G, 8, S_pad] float32 — per-segment precomputed
  components (see `ops.sdf_jax` for the row layout), lane-major so the
  kernel slices (1, SC) rows with no relayout.
- ``meta``: [G, 8] int32 — x0, y0, w, h, nseg per glyph (padding rows
  zeroed, which the kernel's ``w·h = 0`` guard skips).

This is the TPU-native replacement for the reference's per-glyph
serial loop (`/root/reference/src/font/glyph_block.rs:69-80`): glyphs
within a block become one padded device tensor, blocks become the
data-parallel axis (`parallel/`).
"""

from __future__ import annotations

import numpy as np

from ..ops.sdf_jax import DX, DY, DYINV, L2INV, VX, VY, WY

# Shape buckets (multiples of the kernel's SC=128 / TP=1024).
S_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)
P_BUCKETS = (1024, 2048, 4096, 8192, 16384, 32768)


def bucket(value: int, buckets) -> int:
    for b in buckets:
        if value <= b:
            return b
    # Beyond the largest bucket: round up to the largest bucket's
    # granularity. Callers may instead choose a host fallback.
    step = buckets[-1]
    return ((value + step - 1) // step) * step


def pack_segments(seg_list: list[np.ndarray], S_pad: int | None = None) -> np.ndarray:
    """Pack per-glyph (S_i, 4) float64 segment soups into the kernel's
    [G, 8, S_pad] float32 component layout."""
    G = len(seg_list)
    max_s = max((s.shape[0] for s in seg_list), default=0)
    if S_pad is None:
        S_pad = bucket(max(max_s, 1), S_BUCKETS)
    out = np.zeros((G, 8, S_pad), dtype=np.float32)
    for g, segs in enumerate(seg_list):
        n = segs.shape[0]
        if n == 0:
            continue
        vx = segs[:, 0]
        vy = segs[:, 1]
        wx = segs[:, 2]
        wy = segs[:, 3]
        dx = wx - vx
        dy = wy - vy
        l2 = dx * dx + dy * dy
        with np.errstate(divide="ignore"):
            l2inv = np.where(l2 > 0.0, 1.0 / l2, 0.0)
            dyinv = np.where(dy != 0.0, 1.0 / dy, 0.0)
        out[g, VX, :n] = vx
        out[g, VY, :n] = vy
        out[g, DX, :n] = dx
        out[g, DY, :n] = dy
        out[g, L2INV, :n] = l2inv
        out[g, DYINV, :n] = dyinv
        out[g, WY, :n] = wy
    return out


def pack_block(preps, P_pad: int | None = None, S_pad: int | None = None):
    """Pack a list of non-empty `GlyphPrep` into device tensors.

    Returns (segs [G,8,S_pad] f32, meta [G,8] i32, P_pad)."""
    G = len(preps)
    seg_list = [p.segments for p in preps]
    segs = pack_segments(seg_list, S_pad=S_pad)
    max_p = max((p.width * p.height for p in preps), default=0)
    if P_pad is None:
        P_pad = bucket(max(max_p, 1), P_BUCKETS)
    meta = np.zeros((G, 8), dtype=np.int32)
    for g, p in enumerate(preps):
        meta[g, 0] = p.x0
        meta[g, 1] = p.y0
        meta[g, 2] = p.width
        meta[g, 3] = p.height
        meta[g, 4] = p.segments.shape[0]
    return segs, meta, P_pad

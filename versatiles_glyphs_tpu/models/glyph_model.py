"""Differentiable glyph model: Bezier control points → SDF field.

The reference renders fonts; this framework can also *fit* them — the
north-star capability beyond `versatiles-glyphs-rs` (BASELINE.json
configs 2 and 5): pixel values back-propagate to outline control points
and per-glyph placement.

The parity render path flattens adaptively on the host (data-dependent
recursion, non-differentiable; see `ops/flatten.py`). The model path
instead uses **fixed-depth De Casteljau subdivision traced in JAX**:
static shapes, fully differentiable, same dyadic split points as the
reference's adaptive splitter (a uniform depth-k subdivision is a
superset of the adaptive breakpoints, so the polyline is at least as
tight as the reference's flatness tolerance once k covers the curve's
max local depth).

Everything is f32 and shaped [B, C, 4, 2]: a batch of glyphs, each with
C cubic curves (quadratics degree-elevated on ingest; line segments are
cubics with collinear control points). A validity mask [B, C] supports
ragged glyphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import SDF_RADIUS


def elevate_quadratic(start, ctrl, end):
    """Quadratic → cubic control points (exact degree elevation)."""
    c1 = start + 2.0 / 3.0 * (ctrl - start)
    c2 = end + 2.0 / 3.0 * (ctrl - end)
    return jnp.stack([start, c1, c2, end], axis=-2)


def subdivide_cubics(curves: jnp.ndarray, depth: int) -> jnp.ndarray:
    """[..., C, 4, 2] cubics → [..., C·2^depth, 4, 2] via `depth` rounds
    of midpoint De Casteljau splits (the same split as
    `ops.flatten.flatten_cubic`, applied uniformly)."""
    for _ in range(depth):
        s, c1, c2, e = (curves[..., i, :] for i in range(4))
        p01 = (s + c1) * 0.5
        p12 = (c1 + c2) * 0.5
        p23 = (c2 + e) * 0.5
        p012 = (p01 + p12) * 0.5
        p123 = (p12 + p23) * 0.5
        mid = (p012 + p123) * 0.5
        left = jnp.stack([s, p01, p012, mid], axis=-2)
        right = jnp.stack([mid, p123, p23, e], axis=-2)
        # Interleave so curve order (and thus ring order) is preserved.
        curves = jnp.stack([left, right], axis=-3).reshape(
            *curves.shape[:-3], -1, 4, 2
        )
    return curves


def curves_to_segments(curves: jnp.ndarray, depth: int) -> jnp.ndarray:
    """[..., C, 4, 2] cubics → [..., C·2^depth, 4] chord segments
    (vx, vy, wx, wy): each subdivided piece contributes its start→end
    chord, exactly like the adaptive flattener's output."""
    pieces = subdivide_cubics(curves, depth)
    v = pieces[..., 0, :]
    w = pieces[..., 3, :]
    return jnp.concatenate([v, w], axis=-1)


def segment_components(segs: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Differentiable twin of `render.batch.pack_segments`: [..., S, 4]
    segments → the 7 derived component rows, with NaN-safe guards whose
    gradients stay finite at degenerate (zero-length / horizontal)
    segments."""
    vx = segs[..., 0]
    vy = segs[..., 1]
    wx = segs[..., 2]
    wy = segs[..., 3]
    dx = wx - vx
    dy = wy - vy
    l2 = dx * dx + dy * dy
    l2_safe = jnp.where(l2 > 0.0, l2, 1.0)
    l2inv = jnp.where(l2 > 0.0, 1.0 / l2_safe, 0.0)
    dy_safe = jnp.where(dy != 0.0, dy, 1.0)
    dyinv = jnp.where(dy != 0.0, 1.0 / dy_safe, 0.0)
    if mask is not None:
        l2inv = l2inv * mask
    return vx, vy, dx, dy, l2inv, dyinv, wy


def sdf_field(
    segs: jnp.ndarray,
    seg_mask: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    sharpness: float | None = None,
) -> jnp.ndarray:
    """Signed distance of pixels (px, py) [P] to a masked segment soup
    [S, 4] — differentiable.

    With ``sharpness=None`` the distance uses a hard min over segments
    (subgradient flows to the argmin segment — the reference's exact
    semantics) and a hard winding sign (piecewise constant, zero
    gradient). With a float ``sharpness`` the min is replaced by a
    softmin (``-logsumexp(-s·d²)/s``), giving smooth gradients to all
    nearby segments — useful early in fitting.
    """
    vx, vy, dx, dy, l2inv, dyinv, wy = segment_components(segs, None)
    big = jnp.float32(3.0e38)

    pxc = px[:, None]
    pyc = py[:, None]
    ex = pxc - vx[None, :]
    ey = pyc - vy[None, :]
    num = ex * dx[None, :] + ey * dy[None, :]
    t = num * l2inv[None, :]
    tc = jnp.clip(t, 0.0, 1.0)
    qx = ex - tc * dx[None, :]
    qy = ey - tc * dy[None, :]
    d2 = qx * qx + qy * qy
    d2 = jnp.where(seg_mask[None, :], d2, big)

    if sharpness is None:
        dmin2 = jnp.min(d2, axis=1)
        d = jnp.sqrt(jnp.maximum(dmin2, 1e-12))
    else:
        dists = jnp.sqrt(jnp.maximum(d2, 1e-12))
        dists = jnp.where(seg_mask[None, :], dists, 2.0 * SDF_RADIUS)
        s = jnp.float32(sharpness)
        d = -jax.nn.logsumexp(-s * dists, axis=1) / s

    # Winding sign (hard: locally constant in the parameters).
    up = (vy[None, :] <= pyc) & (wy[None, :] > pyc)
    dn = (vy[None, :] > pyc) & (wy[None, :] <= pyc)
    tcr = ey * dyinv[None, :]
    cx = vx[None, :] + tcr * dx[None, :]
    sign = up.astype(jnp.int32) - dn.astype(jnp.int32)
    hit = (cx <= pxc) & seg_mask[None, :] & (up | dn)
    wn = jnp.sum(jnp.where(hit, sign, 0), axis=1)
    sgn = jnp.where(wn != 0, -1.0, 1.0)
    return jax.lax.stop_gradient(sgn) * d


def glyph_field(
    curves: jnp.ndarray,
    curve_mask: jnp.ndarray,
    translate: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    depth: int = 3,
    sharpness: float | None = None,
) -> jnp.ndarray:
    """One glyph's SDF field from its control points.

    curves [C, 4, 2] f32, curve_mask [C] bool, translate [2] f32 (the
    differentiable analogue of the sub-pixel dx shift,
    `renderer.rs:130-131`), pixel centers px/py [P].
    """
    curves = curves + translate[None, None, :]
    segs = curves_to_segments(curves, depth)
    seg_mask = jnp.repeat(curve_mask, 2**depth, axis=-1)
    return sdf_field(segs, seg_mask, px, py, sharpness=sharpness)


def field_to_bytes(field: jnp.ndarray) -> jnp.ndarray:
    """Quantize a signed-distance field to SDF bytes (hard staircase —
    use `sdf_loss` on the pre-quantization field for gradients)."""
    from ..ops.sdf_jax import quantize_sdf

    return quantize_sdf(field)


def bytes_to_field(bitmap: jnp.ndarray) -> jnp.ndarray:
    """Invert the quantization: byte → signed distance in pixels
    (``d = (191 - byte)/32``; exact for unsaturated bytes)."""
    return (191.0 - bitmap.astype(jnp.float32)) / (256.0 / SDF_RADIUS)


def sdf_loss(pred_field, target_field, pix_mask=None):
    """Masked MSE between clipped SDFs — the clip mirrors the byte
    format's saturation so unreachable far-field values don't dominate."""
    r = SDF_RADIUS
    p = jnp.clip(pred_field, -r, r)
    t = jnp.clip(target_field, -r, r)
    err = (p - t) ** 2
    if pix_mask is not None:
        err = err * pix_mask
        return jnp.sum(err) / jnp.maximum(jnp.sum(pix_mask), 1.0)
    return jnp.mean(err)

"""Differentiable model tests: subdivision correctness, field parity
with the render path, and control-point gradients vs finite differences
(north-star config 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versatiles_glyphs_tpu.models.glyph_model import (
    bytes_to_field,
    curves_to_segments,
    elevate_quadratic,
    field_to_bytes,
    glyph_field,
    sdf_field,
    sdf_loss,
    subdivide_cubics,
)


def _square_curves():
    """Unit square (1,2)-(5,2)-(5,6)-(1,6) as four line-cubics."""
    pts = [(1.0, 2.0), (5.0, 2.0), (5.0, 6.0), (1.0, 6.0)]
    curves = []
    for i in range(4):
        s = np.array(pts[i])
        e = np.array(pts[(i + 1) % 4])
        curves.append([s, s + (e - s) / 3, s + 2 * (e - s) / 3, e])
    return jnp.asarray(np.array(curves), jnp.float32)


def test_subdivide_preserves_endpoints():
    c = _square_curves()
    out = subdivide_cubics(c, 2)
    assert out.shape == (16, 4, 2)
    # First piece starts where the curve started; last ends at its end.
    np.testing.assert_allclose(out[0, 0], c[0, 0])
    np.testing.assert_allclose(out[3, 3], c[0, 3])


def test_chords_of_line_cubics_are_exact():
    """A line's subdivided chords lie exactly on the line."""
    c = _square_curves()
    segs = curves_to_segments(c, 3)
    assert segs.shape == (32, 4)
    # All chords of the bottom edge have y == 2.
    np.testing.assert_allclose(segs[:8, 1], 2.0, atol=1e-6)
    np.testing.assert_allclose(segs[:8, 3], 2.0, atol=1e-6)


def test_elevate_quadratic_matches_curve():
    s = jnp.array([0.0, 0.0])
    c = jnp.array([10.0, 10.0])
    e = jnp.array([20.0, 0.0])
    cubic = elevate_quadratic(s, c, e)
    # Evaluate both at t=0.5: quad = 0.25 s + 0.5 c + 0.25 e.
    quad_mid = 0.25 * s + 0.5 * c + 0.25 * e
    b = cubic
    cub_mid = (b[0] + 3 * b[1] + 3 * b[2] + b[3]) / 8.0
    np.testing.assert_allclose(cub_mid, quad_mid, rtol=1e-6)


def test_square_field_matches_exact_renderer():
    """The model's SDF (hard min) over the square must reproduce the
    golden square bitmap once quantized."""
    from versatiles_glyphs_tpu.ops.sdf_ref import render_sdf_exact
    from versatiles_glyphs_tpu.utils.bitmap_art import bitmap_as_digit_art

    c = _square_curves()
    mask = jnp.ones(4, bool)
    # Pixel grid of the reference test: 10x10, x0=-2, y0=-1, Y-flipped.
    i = np.arange(100)
    x = i % 10
    y = 9 - i // 10
    px = jnp.asarray(-2 + x + 0.5, jnp.float32)
    py = jnp.asarray(-1 + y + 0.5, jnp.float32)
    field = glyph_field(c, mask, jnp.zeros(2), px, py, depth=1)
    got = np.asarray(field_to_bytes(field))

    ring = np.array([(1, 2), (5, 2), (5, 6), (1, 6), (1, 2)], dtype=np.float64)
    segs = np.concatenate([ring[:-1], ring[1:]], axis=1)
    want = render_sdf_exact(segs, 10, 10, -2, -1)
    assert bitmap_as_digit_art(got, 10) == bitmap_as_digit_art(want, 10)


def test_bytes_field_roundtrip():
    # The byte format represents d in [-(255-CUTOFF-... ] — concretely
    # [(191-255)/32, 191/32] = [-2, 5.97]; outside that it saturates
    # (render/mod.rs buffer-vs-radius discussion).
    f = jnp.asarray([-1.9, -1.0, 0.0, 1.0, 5.0])
    b = field_to_bytes(f)
    back = bytes_to_field(b)
    np.testing.assert_allclose(np.asarray(back), np.asarray(f), atol=1.0 / 32.0)
    # Saturation ends clamp.
    assert int(field_to_bytes(jnp.asarray([-5.0]))[0]) == 255
    assert int(field_to_bytes(jnp.asarray([50.0]))[0]) == 0


def test_gradients_match_finite_differences(fira_entry):
    """Control-point gradients vs central finite differences on a real
    glyph (Fira 'o', cp 111) — the north-star config 2 validation."""
    from versatiles_glyphs_tpu.models.fitting import make_fit_batch

    batch = make_fit_batch(fira_entry, [111])
    curves = jnp.asarray(batch.curves0[0])
    cmask = jnp.asarray(batch.curve_mask[0])
    px = jnp.asarray(batch.px[0])
    py = jnp.asarray(batch.py[0])
    pmask = jnp.asarray(batch.pix_mask[0])
    target = jnp.asarray(batch.target[0]) * 0.9  # perturbed target

    def loss(c):
        f = glyph_field(c, cmask, jnp.zeros(2), px, py, depth=2)
        return sdf_loss(f, target, pmask)

    g = jax.grad(loss)(curves)
    assert np.isfinite(np.asarray(g)).all()

    rng = np.random.default_rng(0)
    eps = 1e-3
    checked = 0
    base = np.asarray(curves)
    for _ in range(12):
        ci = rng.integers(0, curves.shape[0])
        pi = rng.integers(0, 4)
        xi = rng.integers(0, 2)
        d = np.zeros_like(base)
        d[ci, pi, xi] = eps
        f1 = float(loss(jnp.asarray(base + d)))
        f0 = float(loss(jnp.asarray(base - d)))
        fd = (f1 - f0) / (2 * eps)
        an = float(g[ci, pi, xi])
        # Min/clip kinks make some points non-smooth; require agreement
        # on the clearly smooth ones and direction otherwise.
        if abs(fd) > 1e-4 or abs(an) > 1e-4:
            assert an == pytest.approx(fd, rel=0.15, abs=2e-3), (ci, pi, xi)
            checked += 1
    assert checked >= 5


def test_soft_min_field_close_to_hard():
    c = _square_curves()
    mask = jnp.ones(4, bool)
    px = jnp.asarray(np.linspace(-1, 7, 32), jnp.float32)
    py = jnp.full(32, 4.0, jnp.float32)
    hard = sdf_field(curves_to_segments(c, 1), jnp.ones(8, bool), px, py)
    soft = sdf_field(
        curves_to_segments(c, 1), jnp.ones(8, bool), px, py, sharpness=50.0
    )
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=0.15)

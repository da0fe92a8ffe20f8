"""Compiled-Pallas parity on real TPU hardware.

Skipped in the hermetic CPU suite (the Pallas interpreter is too slow
to stand in off-TPU; the kernel's jnp twin covers the math in
tests/test_kernel.py). On a TPU machine run:

    VG_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
"""


import numpy as np
import pytest

jax = pytest.importorskip("jax")

from versatiles_glyphs_tpu.utils.device import on_tpu  # noqa: E402

if not on_tpu():
    pytest.skip("requires TPU hardware (VG_TPU_TESTS=1)", allow_module_level=True)

from versatiles_glyphs_tpu.ops.legacy import (
    render_bitmaps_pallas,
    render_bitmaps_pallas_tiles,
)
from versatiles_glyphs_tpu.ops.sdf_pallas import render_bitmaps_pallas_pts
from versatiles_glyphs_tpu.ops.sdf_ref import render_sdf_exact
from versatiles_glyphs_tpu.render.batch import pack_flat, pack_points, plan_tiles
from versatiles_glyphs_tpu.render.metrics import prepare_glyph

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"


def _block_preps(fira_entry):
    preps = []
    for cp in fira_entry.metadata.codepoints:
        if cp >= 256:
            break
        name = fira_entry.glyph_name(cp)
        p = prepare_glyph(
            cp,
            fira_entry.outline_rings(name),
            fira_entry.units_per_em,
            fira_entry.hor_advance(name),
        )
        if p is not None and not p.empty:
            preps.append(p)
    return preps


def test_pallas_block_parity(fira_entry):
    preps = _block_preps(fira_entry)
    flat, meta, P = pack_flat(preps)
    out = np.asarray(render_bitmaps_pallas(flat, meta, P, TP=min(1024, P)))
    maxdiff = 0
    ndiff = 0
    total = 0
    for g, p in enumerate(preps):
        got = out[g, : p.width * p.height].astype(int)
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0).astype(int)
        d = np.abs(got - want)
        maxdiff = max(maxdiff, int(d.max()))
        ndiff += int((d > 0).sum())
        total += d.size
    assert maxdiff <= 1
    assert ndiff <= total * 0.005


def test_pallas_pts_parity(fira_entry):
    preps = _block_preps(fira_entry)
    pts, words, meta, _ = pack_points(preps)
    TP = 256
    tmeta, starts, _ = plan_tiles(preps, meta, TP)
    out = np.asarray(
        render_bitmaps_pallas_pts(pts, words, np.ascontiguousarray(tmeta.T), TP)
    ).reshape(-1)
    maxdiff = 0
    ndiff = 0
    total = 0
    for g, p in enumerate(preps):
        got = out[starts[g] * TP : starts[g] * TP + p.width * p.height].astype(int)
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0).astype(int)
        d = np.abs(got - want)
        maxdiff = max(maxdiff, int(d.max()))
        ndiff += int((d > 0).sum())
        total += d.size
    assert maxdiff <= 1
    assert ndiff <= total * 0.005


def test_pallas_pts_i16_parity(fira_entry):
    """The i16 fixed-point transport on the compiled kernel: ±1 byte
    on a few percent of pixels (see `GlyphPrep.chain16`)."""
    preps = _block_preps(fira_entry)
    assert all(p.q16_ok for p in preps)
    pts, words, meta, _ = pack_points(preps, dtype=np.int16)
    TP = 256
    tmeta, starts, _ = plan_tiles(preps, meta, TP)
    out = np.asarray(
        render_bitmaps_pallas_pts(pts, words, np.ascontiguousarray(tmeta.T), TP)
    ).reshape(-1)
    maxdiff = 0
    ndiff = 0
    total = 0
    for g, p in enumerate(preps):
        got = out[starts[g] * TP : starts[g] * TP + p.width * p.height].astype(int)
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0).astype(int)
        d = np.abs(got - want)
        maxdiff = max(maxdiff, int(d.max()))
        ndiff += int((d > 0).sum())
        total += d.size
    assert maxdiff <= 1
    assert ndiff <= total * 0.05


def test_pallas_tiles_parity(fira_entry):
    preps = _block_preps(fira_entry)
    flat, meta, _ = pack_flat(preps)
    TP = 256
    tmeta, starts, _ = plan_tiles(preps, meta, TP)
    out = np.asarray(
        render_bitmaps_pallas_tiles(flat, np.ascontiguousarray(tmeta.T), TP)
    ).reshape(-1)
    maxdiff = 0
    ndiff = 0
    total = 0
    for g, p in enumerate(preps):
        got = out[starts[g] * TP : starts[g] * TP + p.width * p.height].astype(int)
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0).astype(int)
        d = np.abs(got - want)
        maxdiff = max(maxdiff, int(d.max()))
        ndiff += int((d > 0).sum())
        total += d.size
    assert maxdiff <= 1
    assert ndiff <= total * 0.005


def test_grad_kernel_hw_parity(fira_entry):
    """Compiled custom-VJP pair vs the jnp model path, on hardware:
    forward fields match to f32 tolerance; gradients match up to
    subgradient choice at exact distance ties (see test_grad_kernel)."""
    import jax.numpy as jnp

    from versatiles_glyphs_tpu.models.fitting import (
        batch_loss,
        batch_loss_kernel,
        init_params,
        make_fit_batch,
    )

    batch = make_fit_batch(fira_entry, [111, 110, 65])  # 'o', 'n', 'A'
    params = init_params(batch.curves0)
    dev = {
        "curve_mask": jnp.asarray(batch.curve_mask),
        "px": jnp.asarray(batch.px, jnp.float32),
        "py": jnp.asarray(batch.py, jnp.float32),
        "pix_mask": jnp.asarray(batch.pix_mask, jnp.float32),
        "target": jnp.asarray(batch.target, jnp.float32),
        "meta": jnp.asarray(batch.meta, jnp.int32),
    }
    lj, gj = jax.value_and_grad(batch_loss)(params, dev, 2, None)
    lk, gk = jax.value_and_grad(batch_loss_kernel)(params, dev, 2, False)
    assert abs(float(lj) - float(lk)) < 1e-4 * max(float(lj), 1e-6)
    a, b = np.asarray(gj["translate"]), np.asarray(gk["translate"])
    scale = max(np.abs(a).max(), 1e-6)
    np.testing.assert_allclose(b, a, atol=5e-4 * scale)
    a, b = np.asarray(gj["curves"]), np.asarray(gk["curves"])
    scale = max(np.abs(a).max(), 1e-6)
    assert (np.abs(a - b) > 1e-3 * scale).mean() < 0.15


def test_flat_pair_grads_match_twin_on_hw():
    """The TPU custom-VJP pair (oracle kernel + Pallas backward
    reduction) must match the jnp twin's loss bitwise and gradients
    closely on real hardware."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.models.fitting import (
        FontFitter,
        build_flat_plan,
        flat_chain_points,
        make_fit_batch,
    )
    from versatiles_glyphs_tpu.models.glyph_model import sdf_loss
    from versatiles_glyphs_tpu.ops.sdf_grad import signed_field_flat

    with open(FIRA, "rb") as f:
        entry = FontFileEntry(f.read())
    cps = [cp for cp in entry.metadata.codepoints if 65 <= cp < 123]
    batch = make_fit_batch(entry, cps)
    fitter = FontFitter(depth=3, backend="pallas")
    params, _opt, dev = fitter.init(batch)
    plan = build_flat_plan(batch.curve_mask, batch.meta, 3, batch.target.shape[1])

    def loss_with(interp):
        def f(p):
            flat = flat_chain_points(
                p["curves"], p["translate"], 3,
                dev["chunk_map"], dev["inv_chunk"],
            )
            field = signed_field_flat(
                flat, dev["plan_words"], dev["plan_tmeta"], 256,
                plan.L_max, interpret=interp,
            )
            B = p["curves"].shape[0]
            fb = jnp.take(field, dev["row_map"].reshape(-1), axis=0)
            fb = fb.reshape(B, -1)
            losses = jax.vmap(sdf_loss)(
                fb * jnp.exp(p["log_gain"]), dev["target"], dev["pix_mask"]
            )
            return jnp.mean(losses)

        return f

    lk, gk = jax.jit(jax.value_and_grad(loss_with(False)))(params)
    lt, gt = jax.jit(jax.value_and_grad(loss_with(True)))(params)
    assert float(lk) == float(lt), (float(lk), float(lt))
    for k in ("curves", "translate", "log_gain"):
        a, b = np.asarray(gk[k]), np.asarray(gt[k])
        scale = np.abs(b).mean() + 1e-12
        assert np.abs(a - b).max() < 1e-3 * scale, k


def test_pallas_delta_parity_matches_i16(fira_entry):
    """The i8-delta wire format must be byte-identical to the i16
    transport through the COMPILED kernel (decode happens in the same
    jit), and within the ±1-byte parity bound vs exact f64."""
    from versatiles_glyphs_tpu.render.driver import Renderer

    preps = _block_preps(fira_entry)
    b8 = Renderer("tpu", transport="i8").render_bitmaps(preps)
    b16 = Renderer("tpu", transport="i16").render_bitmaps(preps)
    for a, b in zip(b8, b16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    worst, nbad, tot = 0, 0, 0
    for p, bm in zip(preps, b8):
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
        d = np.abs(np.asarray(bm, np.int32) - want.astype(np.int32))
        worst = max(worst, int(d.max(initial=0)))
        nbad += int((d > 0).sum())
        tot += d.size
    assert worst <= 1
    assert nbad <= tot * 0.05


@pytest.mark.parametrize("font", ["Arabic", "Tamil"])
def test_pallas_noto_complex_script_parity(font):
    """Hardware parity on complex-script Noto outlines (long curve
    runs, high per-glyph segment counts, q16 range edges — stress the
    kernel where Fira doesn't). Same ≤1-byte/≤5% bound, default (i8)
    transport."""
    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.render.driver import Renderer

    path = f"/root/reference/testdata/Noto Sans/Noto Sans {font} - Regular.ttf"
    with open(path, "rb") as f:
        entry = FontFileEntry(f.read())
    r = Renderer("tpu")
    preps = []
    for cp in entry.metadata.codepoints:
        p = r.prep_glyph(entry, cp)
        if p is not None and not p.empty:
            preps.append(p)
    bitmaps = r.render_bitmaps(preps)
    worst, nbad, tot = 0, 0, 0
    for gi in range(0, len(preps), max(1, len(preps) // 80)):
        p = preps[gi]
        want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
        d = np.abs(np.asarray(bitmaps[gi], np.int32) - want.astype(np.int32))
        worst = max(worst, int(d.max(initial=0)))
        nbad += int((d > 0).sum())
        tot += d.size
    assert worst <= 1, (font, worst)
    assert nbad <= tot * 0.05, (font, 100 * nbad / tot)


def test_pallas_all_noto_fonts_parity_sweep():
    """Every Noto Sans script file in the reference's own timing set
    (`/root/reference/scripts/test_merge.sh`) renders through the full
    production device path within the ±1-byte / ≤5%-of-pixels bound vs
    the exact f64 renderer (sampled glyphs per font) — the broad-sweep
    complement to the per-font gates above."""
    import glob

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.render.driver import Renderer

    paths = sorted(glob.glob("/root/reference/testdata/Noto Sans/*.ttf"))
    assert len(paths) >= 15
    r = Renderer("tpu")
    for path in paths:
        with open(path, "rb") as f:
            entry = FontFileEntry(f.read())
        preps = [
            p
            for p in r.prep_block(
                (cp, entry) for cp in entry.metadata.codepoints
            )
            if not p.empty
        ]
        bitmaps = r.render_bitmaps(preps)
        worst, nbad, tot = 0, 0, 0
        for gi in range(0, len(preps), max(1, len(preps) // 25)):
            p = preps[gi]
            want = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
            d = np.abs(
                np.asarray(bitmaps[gi], np.int32) - want.astype(np.int32)
            )
            worst = max(worst, int(d.max(initial=0)))
            nbad += int((d > 0).sum())
            tot += d.size
        assert worst <= 1, (path, worst)
        assert nbad <= tot * 0.05, (path, 100 * nbad / tot)

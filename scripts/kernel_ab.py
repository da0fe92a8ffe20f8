"""A/B a kernel variant against the production points kernel.

Variant: (TP, SC) running accumulators for min-d2 and winding, reduced
ONCE per tile, instead of per-chunk cross-lane reductions (each a
log2(128)-step lane shuffle). Measures bit-equality + difference-method
timing on the real Fira workload (VERDICT r04 ask 6 / r05 ask 6).
"""

import functools
import sys
import time

import numpy as np

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"


def diff_time(make_out, drain, long=25, short=5):
    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = make_out()
        drain(out)
        return time.perf_counter() - t0

    chain(2)
    return (chain(long) - chain(short)) / (long - short)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from versatiles_glyphs_tpu.constants import CUTOFF, SDF_RADIUS
    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.ops.sdf_pallas import (
        BT, SC, _pts_prepass, render_bitmaps_pallas_pts,
    )
    from versatiles_glyphs_tpu.render.batch import pack_points, plan_tiles
    from versatiles_glyphs_tpu.render.driver import Renderer
    from versatiles_glyphs_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    _BIG = 3.0e38
    TP = 256

    r = Renderer("tpu")
    with open(FIRA, "rb") as f:
        entry = FontFileEntry(f.read())
    preps = []
    for cp in entry.metadata.codepoints:
        p = r.prep_glyph(entry, cp)
        if p is not None and not p.empty:
            preps.append(p)
    pts, words, meta, _ = pack_points(preps, dtype=np.int16)
    tmeta, starts, T_used = plan_tiles(preps, meta, TP)
    tmT = np.ascontiguousarray(tmeta.T)
    n_pixels = sum(p.width * p.height for p in preps)

    pts_d = jax.device_put(pts)
    words_d = jax.device_put(words)
    tmT_d = jax.device_put(tmT)
    jax.block_until_ready((pts_d, words_d, tmT_d))

    # --- variant kernel: (tp, SC) accumulators, one reduce per tile ---
    def _kernel_acc(tmeta_ref, vx_ref, vy_ref, wx_ref, wy_ref, ok_ref,
                    out_ref, *, tp: int):
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
            def _compute(bi=bi, x0=x0, y0=y0, w=w, h=h, npts=npts,
                         off=off, base=base):
                i = base + iota_tp
                ws = jnp.maximum(w, 1)
                fws = ws.astype(jnp.float32)
                row = jnp.floor(
                    (i.astype(jnp.float32) + 0.5) / fws
                ).astype(jnp.int32)
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

    @functools.partial(jax.jit, static_argnames=("TP",))
    def render_acc(pts, mask_words, tmeta, TP=256):
        X, Y, WX, WY, OK = _pts_prepass(pts, mask_words)
        T = tmeta.shape[1]
        M = X.shape[0]
        resident = pl.BlockSpec((M, SC), lambda b, tmeta: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // BT,),
            in_specs=[resident] * 5,
            out_specs=pl.BlockSpec(
                (BT, TP // 128, 128), lambda b, tmeta: (b, 0, 0)
            ),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_acc, tp=TP),
            out_shape=jax.ShapeDtypeStruct((T, TP // 128, 128), jnp.float32),
            grid_spec=grid_spec,
        )(tmeta, X, Y, WX, WY, OK)
        return out.reshape(T, TP).astype(jnp.uint8)

    # Bit-equality vs production.
    want = np.asarray(render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP))
    got = np.asarray(render_acc(pts_d, words_d, tmT_d, TP))
    eq = np.array_equal(want[:T_used], got[:T_used])
    print(f"bit-equal: {eq}", file=sys.stderr)
    if not eq:
        d = np.abs(want[:T_used].astype(int) - got[:T_used].astype(int))
        print(f"  max delta {d.max()}, ndiff {(d > 0).sum()}", file=sys.stderr)

    def drain(o):
        np.asarray(o[:1])

    t_prod = diff_time(
        lambda: render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP), drain
    )
    t_acc = diff_time(lambda: render_acc(pts_d, words_d, tmT_d, TP), drain)
    print(
        f"production: {t_prod * 1e3:.2f} ms = {n_pixels / t_prod / 1e6:.1f} "
        f"Mpix/s\nvariant:    {t_acc * 1e3:.2f} ms = "
        f"{n_pixels / t_acc / 1e6:.1f} Mpix/s  ({t_prod / t_acc:.2f}x)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

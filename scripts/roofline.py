"""Roofline the production points kernel (`_sdf_kernel_tiles_pts`).

Measures, with device-resident inputs (no transfers in the timed
region):
  1. kernel-only wall time -> achieved Mpixel/s and lane-op/s,
  2. an empirical VPU roof: the same grid/loop structure doing the same
     number of (TP, SC) f32 vector ops with no DMA and no SDF logic,
  3. an empirical HBM roof (on-device copy bandwidth),
  4. the i16 dequant prepass cost,
  5. upload/fetch rates for context (the tunnel numbers).

Run on the TPU machine: python scripts/roofline.py
"""

import functools
import time

import numpy as np

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"


def timeit(fn, iters=5):
    fn()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.ops.sdf_pallas import (
        SC, WINDOW_LANES, render_bitmaps_pallas_pts,
    )
    from versatiles_glyphs_tpu.render.batch import pack_points, plan_tiles
    from versatiles_glyphs_tpu.render.driver import Renderer

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    with open(FIRA, "rb") as f:
        entry = FontFileEntry(f.read())
    r = Renderer("tpu")
    preps = [
        p
        for cp in entry.metadata.codepoints
        if (p := r.prep_glyph(entry, cp)) is not None and not p.empty
    ]

    TP = 256
    pts, words, meta, _ = pack_points(preps, dtype=np.int16)
    tmeta, starts, T_used = plan_tiles(preps, meta, TP)
    tmT = np.ascontiguousarray(tmeta.T)
    N = pts.shape[1]
    T = tmeta.shape[0]
    npix = sum(p.width * p.height for p in preps)

    # Exact executed work: per glyph, lanes from the SC-aligned floor.
    off = meta[:, 5].astype(np.int64)
    npts = meta[:, 4].astype(np.int64)
    astart = off // SC * SC
    nlanes = off - astart + np.maximum(npts - 1, 0)
    nchunks = np.maximum(-(-nlanes // SC), 1)
    nwin = np.maximum(-(-nlanes // WINDOW_LANES), 1)
    g_npix = (meta[:, 2] * meta[:, 3]).astype(np.int64)
    ntiles = np.maximum(1, -(-g_npix // TP))
    chunk_iters = int((ntiles * nchunks).sum())
    win_iters = int((ntiles * nwin).sum())
    lane_ops = chunk_iters * TP * SC  # (TP,SC) vector op instances
    print(
        f"G={len(preps)} N={N} T={T} (used {T_used}) npix={npix}"
        f" chunk-iters={chunk_iters} window-iters={win_iters}"
        f" lane-ops={lane_ops/1e6:.1f}M (~30 f32 ops each ->"
        f" {lane_ops*30/1e9:.1f} G f32 ops)"
    )

    # --- transfers (context) ---
    t = timeit(lambda: jax.device_put(pts).block_until_ready())
    print(f"upload pts i16 {pts.nbytes/1e6:.1f} MB: {t*1e3:.1f} ms"
          f" ({pts.nbytes/t/1e6:.0f} MB/s)")
    pts_d = jax.device_put(pts)
    words_d = jax.device_put(words)
    tmT_d = jax.device_put(tmT)

    # --- kernel-only ---
    fn = lambda: render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP).block_until_ready()
    t_k = timeit(fn)
    out = render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP)
    print(
        f"kernel-only: {t_k*1e3:.2f} ms -> {npix/t_k/1e6:.1f} Mpix/s,"
        f" {lane_ops/t_k/1e9:.1f} G lane-ops/s,"
        f" {lane_ops*30/t_k/1e12:.3f} T f32 op/s"
    )
    t_f = timeit(lambda: np.asarray(out))
    print(f"fetch {out.nbytes/1e6:.1f} MB: {t_f*1e3:.1f} ms ({out.nbytes/t_f/1e6:.0f} MB/s)")

    # --- i16 dequant prepass cost (XLA pass before the kernel) ---
    @jax.jit
    def dequant(x):
        return x.astype(jnp.float32) * jnp.float32(1.0 / 256.0)

    t_dq = timeit(lambda: dequant(pts_d).block_until_ready())
    print(f"i16 dequant prepass: {t_dq*1e3:.2f} ms")

    # --- empirical VPU roof: same grid, same per-chunk (TP,SC) vector op
    # count, no DMA / no scalars ---
    K_OPS = 30

    def _roof_kernel(tmeta_ref, out_ref, acc_ref, *, tp, n_chunk):
        acc_ref[...] = jnp.full((tp, SC), 1.0, jnp.float32)
        def body(c, x):
            a = acc_ref[...]
            for _ in range(K_OPS // 3):
                a = a * 1.000001 + x  # 2 ops
                a = jnp.minimum(a, 3.0e38)  # 1 op
            acc_ref[...] = a
            return x + 1.0
        jax.lax.fori_loop(0, n_chunk, body, 0.5)
        out_ref[...] = acc_ref[...,:1].reshape(1, tp // 128, 128)

    avg_chunks = chunk_iters / int(ntiles.sum())
    n_chunk = max(1, round(avg_chunks))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(ntiles.sum()),),
        in_specs=[],
        out_specs=pl.BlockSpec((1, TP // 128, 128), lambda t, m: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((TP, SC), jnp.float32)],
    )
    roof = pl.pallas_call(
        functools.partial(_roof_kernel, tp=TP, n_chunk=n_chunk),
        out_shape=jax.ShapeDtypeStruct((int(ntiles.sum()), TP // 128, 128), jnp.float32),
        grid_spec=grid_spec,
    )
    t_r = timeit(lambda: roof(tmT_d).block_until_ready())
    roof_ops = int(ntiles.sum()) * n_chunk * TP * SC * K_OPS
    print(
        f"VPU roof (same shape, {n_chunk} chunks/tile, {K_OPS} ops/lane):"
        f" {t_r*1e3:.2f} ms -> {roof_ops/t_r/1e12:.3f} T f32 op/s"
        f" | kernel at {100*(lane_ops*30/t_k)/(roof_ops/t_r):.0f}% of roof"
    )

    # --- HBM roof ---
    big = jax.device_put(np.zeros((64, 1024, 1024), np.float32))
    t_c = timeit(lambda: jnp.copy(big).block_until_ready())
    print(f"HBM copy roof: {2*big.nbytes/t_c/1e9:.0f} GB/s")
    # kernel HBM traffic: window DMAs (f32 after dequant) + output
    hbm_bytes = win_iters * 2 * (WINDOW_LANES + 128) * 4 + T_used * TP * 4
    print(f"kernel HBM traffic ~{hbm_bytes/1e6:.1f} MB -> {hbm_bytes/t_k/1e9:.1f} GB/s achieved")


if __name__ == "__main__":
    main()

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


def diff_time(make_out, drain, long=25, short=5):
    """Difference-method device timing: on this tunnel
    `block_until_ready` returns at ENQUEUE and each dispatch round-trip
    is ~25 ms, so (T(long chain + drain) − T(short chain + drain)) /
    (long − short) cancels both (docs/kernel_roofline.md)."""

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = make_out()
        drain(out)
        return time.perf_counter() - t0

    chain(2)  # warm
    return (chain(long) - chain(short)) / (long - short)


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

    # --- transfers (context; forced round trip — block_until_ready
    # returns at enqueue on this tunnel) ---
    @jax.jit
    def _touch(x):
        return x[:1, :128].astype(jnp.int32).sum()

    def up_rt():
        d = jax.device_put(pts)
        np.asarray(_touch(d))

    t = timeit(up_rt, iters=3)
    print(f"upload pts i16 {pts.nbytes/1e6:.1f} MB: {t*1e3:.1f} ms"
          f" ({pts.nbytes/t/1e6:.0f} MB/s)")
    pts_d = jax.device_put(pts)
    words_d = jax.device_put(words)
    tmT_d = jax.device_put(tmT)

    # --- kernel-only (difference method) ---
    t_k = diff_time(
        lambda: render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP),
        lambda out: np.asarray(out[:1]),
    )
    out = render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP)
    print(
        f"kernel-only: {t_k*1e3:.2f} ms -> {npix/t_k/1e6:.1f} Mpix/s,"
        f" {lane_ops/t_k/1e9:.1f} G lane-ops/s,"
        f" {lane_ops*30/t_k/1e12:.3f} T f32 op/s"
    )
    keep = -(-T_used // 256) * 256

    def fetch_rt():
        o = render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP)
        np.asarray(o[:1])  # drain the kernel
        t0 = time.perf_counter()
        np.asarray(o[:keep])
        return time.perf_counter() - t0

    fetch_rt()
    t_f = min(fetch_rt() for _ in range(3))
    print(
        f"fetch {keep * TP / 1e6:.1f} MB: {t_f*1e3:.1f} ms"
        f" ({keep * TP / t_f / 1e6:.0f} MB/s)"
    )

    # --- i16 dequant prepass cost (XLA pass before the kernel) ---
    @jax.jit
    def dequant(x):
        return x.astype(jnp.float32) * jnp.float32(1.0 / 256.0)

    t_dq = diff_time(
        lambda: dequant(pts_d), lambda out: np.asarray(out[:1, :128])
    )
    print(f"i16 dequant prepass: {t_dq*1e3:.2f} ms")

    # --- i8-delta wire: upload + on-device decode cost (the default
    # transport; see ops.sdf_pallas.reconstruct_delta) ---
    from versatiles_glyphs_tpu.ops.sdf_pallas import reconstruct_delta
    from versatiles_glyphs_tpu.render.batch import pack_points_delta

    deltas, _w8, anchors, _m8 = pack_points_delta(preps, arena_tag="_rl")
    def up8_rt():
        d = jax.device_put(deltas)
        a = jax.device_put(anchors)
        np.asarray(_touch(d))
        np.asarray(_touch(a[:1].reshape(1, -1)[:, :128][None][0]))

    t_u8 = timeit(up8_rt, iters=3)
    print(
        f"upload i8-delta {(deltas.nbytes + anchors.nbytes)/1e6:.1f} MB: "
        f"{t_u8*1e3:.1f} ms"
    )
    d8_d = jax.device_put(deltas)
    anc_d = jax.device_put(anchors)
    jax.block_until_ready((d8_d, anc_d))
    recon = jax.jit(reconstruct_delta)
    t_rc = diff_time(
        lambda: recon(d8_d, anc_d), lambda out: np.asarray(out[:1, :128])
    )
    print(
        f"i8-delta decode (scatter-add + cumsum, K={anchors.shape[1]}): "
        f"{t_rc*1e3:.2f} ms"
    )

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
    t_r = diff_time(
        lambda: roof(tmT_d), lambda out: np.asarray(out[:1]), long=12, short=4
    )
    roof_ops = int(ntiles.sum()) * n_chunk * TP * SC * K_OPS
    print(
        f"VPU roof (same shape, {n_chunk} chunks/tile, {K_OPS} ops/lane):"
        f" {t_r*1e3:.2f} ms -> {roof_ops/t_r/1e12:.3f} T f32 op/s"
        f" | kernel at {100*(lane_ops*30/t_k)/(roof_ops/t_r):.0f}% of roof"
    )

    # --- HBM roof ---
    big = jax.device_put(np.zeros((64, 1024, 1024), np.float32))
    t_c = diff_time(
        lambda: jnp.copy(big), lambda out: np.asarray(out[:1, :1, :128]),
        long=8, short=3,
    )
    print(f"HBM copy roof: {2*big.nbytes/t_c/1e9:.0f} GB/s")
    # kernel HBM traffic: window DMAs (f32 after dequant) + output
    hbm_bytes = win_iters * 2 * (WINDOW_LANES + 128) * 4 + T_used * TP * 4
    print(f"kernel HBM traffic ~{hbm_bytes/1e6:.1f} MB -> {hbm_bytes/t_k/1e9:.1f} GB/s achieved")


if __name__ == "__main__":
    main()

"""Break down the TPU render path cost: host prep / upload / dispatch /
kernel / fetch. Run on the TPU machine: python scripts/profile_tpu.py

Quick-look tool using naive per-call timing — on the axon tunnel
`block_until_ready` returns at enqueue, so its per-stage numbers
conflate dispatch/transfer latency. For rigorous kernel numbers use
`scripts/roofline.py` (difference method) and the bench's stage split.
"""

import time

import numpy as np

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"


def main():
    import jax

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.ops.legacy import render_bitmaps_pallas_tiles
    from versatiles_glyphs_tpu.render.batch import pack_flat, plan_tiles
    from versatiles_glyphs_tpu.render.metrics import prepare_glyph

    with open(FIRA, "rb") as f:
        entry = FontFileEntry(f.read())

    preps = []
    for cp in entry.metadata.codepoints:
        name = entry.glyph_name(cp)
        if name is None:
            continue
        p = prepare_glyph(
            cp, entry.outline_rings(name), entry.units_per_em,
            entry.hor_advance(name),
        )
        if not p.empty:
            preps.append(p)

    TP = 256
    t0 = time.time()
    flat, meta, _ = pack_flat(preps)
    tmeta, starts, _ = plan_tiles(preps, meta, TP)
    t_pack = time.time() - t0
    T = tmeta.shape[0]
    N = flat.shape[1]
    npix = sum(p.width * p.height for p in preps)
    print(f"G={len(preps)} N={N} lanes ({N * 16 / 1e6:.1f} MB) T={T} tiles "
          f"npix={npix} pack={t_pack * 1e3:.1f} ms")
    nseg_tot = int(meta[:, 4].sum())
    work = int((tmeta[:, 2] * tmeta[:, 3] > tmeta[:, 6]).sum()) * TP
    chunks = (-(-np.maximum(meta[:, 4], 1) // 128))
    ntile_g = np.maximum(1, -(-((meta[:, 2] * meta[:, 3]).astype(np.int64)) // TP))
    pairs = int((ntile_g * TP * chunks * 128).sum())
    print(f"nseg={nseg_tot} pair-ops={pairs / 1e6:.1f} M  (~{pairs * 26 / 1e9:.2f} GFLOP)")

    tmT = np.ascontiguousarray(tmeta.T)

    # upload
    for it in range(3):
        t0 = time.time()
        flat_d = jax.device_put(flat)
        flat_d.block_until_ready()
        t1 = time.time()
        tm_d = jax.device_put(tmT)
        tm_d.block_until_ready()
        t2 = time.time()
        print(f"[{it}] upload flat={1e3 * (t1 - t0):.1f} ms  tmeta={1e3 * (t2 - t1):.1f} ms")

    # compile
    out = render_bitmaps_pallas_tiles(flat_d, tm_d, TP)
    out.block_until_ready()

    for it in range(5):
        t0 = time.time()
        out = render_bitmaps_pallas_tiles(flat_d, tm_d, TP)
        out.block_until_ready()
        t1 = time.time()
        host = np.asarray(out)
        t2 = time.time()
        print(f"[{it}] kernel={1e3 * (t1 - t0):.1f} ms  fetch={1e3 * (t2 - t1):.1f} ms "
              f"({host.nbytes / 1e6:.2f} MB)")

    # end-to-end driver path
    from versatiles_glyphs_tpu.render.driver import Renderer
    r = Renderer("tpu")
    r.render_bitmaps(preps)
    for it in range(3):
        t0 = time.time()
        r.render_bitmaps(preps)
        print(f"[{it}] driver end-to-end={1e3 * (time.time() - t0):.1f} ms")


if __name__ == "__main__":
    main()

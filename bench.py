"""Benchmark: SDF glyph rendering throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric: glyphs/s through the batched SDF render path (host
flatten+metrics excluded — measured separately below — so the number is
the device render throughput on real font workload: every non-empty
glyph of Fira Sans Regular, the reference repo's own profiling workload,
`/root/reference/scripts/profile_recurse.sh`).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the baseline is the bit-exact float64 host implementation of the
reference algorithm (`ops/sdf_ref.py`, single thread) timed on the same
machine on a glyph sample — i.e. speedup over reference-equivalent
single-core CPU rendering.

Methodology history (round-over-round comparability):
  r01: f32 transport, single-font workload, numpy 1-thread CPU baseline.
  r02: i16 default transport; K=8 multi-font device workload (per-font
       time = total/K, so group pipelining is measured as the CLI sees
       it); CPU baseline switched to the native MULTI-CORE exact
       renderer (so ``vs_baseline`` dropped without the device path
       changing — compare ``value``/``mpixel_per_s`` across rounds, not
       ``vs_baseline``).
  r03: adds the stderr stage decomposition (pack/upload/kernel/fetch +
       kernel-only Mpix/s, device-resident inputs) and an i16-vs-f32
       end-to-end comparison; e2e path now pipelines prep/assembly with
       device work (`render.driver.RenderSession`).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"


def main() -> None:
    import jax

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.ops.sdf_pallas import default_interpret
    from versatiles_glyphs_tpu.ops.sdf_ref import render_sdf_exact
    from versatiles_glyphs_tpu.render.driver import Renderer

    from versatiles_glyphs_tpu.utils.device import enable_compilation_cache
    enable_compilation_cache()
    backend = jax.default_backend()
    interpret = default_interpret()

    with open(FIRA, "rb") as f:
        fira_bytes = f.read()

    renderer0 = Renderer("tpu")

    # Host prep (parse + flatten + metrics) for the whole font, via the
    # production fast path (vectorized font-level cores). Warm loop
    # first: fontTools' lazy per-table imports and the process's
    # first-touch page faults are one-time costs, not per-font costs.
    entry = FontFileEntry(fira_bytes)
    preps = [renderer0.prep_glyph(entry, cp) for cp in entry.metadata.codepoints]
    t_prep0 = time.time()
    entry = FontFileEntry(fira_bytes)
    preps = []
    for cp in entry.metadata.codepoints:
        p = renderer0.prep_glyph(entry, cp)
        if p is not None and not p.empty:
            preps.append(p)
    t_prep = time.time() - t_prep0

    renderer = Renderer("tpu")

    # The production workload shape: a multi-font run (K copies of the
    # font), rendered through the same batched call that
    # `FontManager.render_glyphs` makes for a whole `recurse`/`merge`
    # invocation — every SMEM-sized group is dispatched before any
    # result is fetched, so uploads/compute/downloads pipeline across
    # groups exactly as they do in the CLI. Per-blocking-call timing
    # would instead charge each font the tunnel's ~25 ms round-trip
    # (an artifact of the single-chip test harness, not of the design).
    K = 1 if interpret else 8
    workload = preps * K

    renderer.render_bitmaps(workload)  # compile + warm caches
    # min over 5: the tunnel's transfer legs vary ~1.5× between
    # invocations; the best iteration is the reproducible figure.
    iters = 1 if interpret else 5
    times = []
    for _ in range(iters):
        t0 = time.time()
        renderer.render_bitmaps(workload)
        times.append((time.time() - t0) / K)
    dt = min(times)

    n_glyphs = len(preps)
    n_pixels = sum(p.width * p.height for p in preps)
    glyphs_per_s = n_glyphs / dt
    mpix_per_s = n_pixels / dt / 1e6

    # Stage decomposition (roofline-style, ONE canonical group of the
    # font): pack (host), upload (device_put, blocking), kernel-only
    # (device-resident inputs, block_until_ready), fetch (np.asarray of
    # the used tile prefix). These four do NOT sum to the pipelined
    # device_render time above — groups overlap — but they attribute
    # it: a transfer-path regression shows up here even when the
    # kernel got faster.
    split = {}
    if not interpret:
        try:
            from versatiles_glyphs_tpu.render.batch import (
                pack_points, plan_tiles,
            )

            TP = 256

            def timeit(fn, iters=3):
                fn()
                best = float("inf")
                for _ in range(iters):
                    t0 = time.perf_counter()
                    fn()
                    best = min(best, time.perf_counter() - t0)
                return best

            t0 = time.perf_counter()
            pts, words, meta, _ = pack_points(preps, dtype=np.int16)
            tmeta, starts, T_used = plan_tiles(preps, meta, TP)
            tmT = np.ascontiguousarray(tmeta.T)
            split["pack_s"] = round(time.perf_counter() - t0, 4)
            split["upload_s"] = round(
                timeit(
                    lambda: jax.block_until_ready(
                        (
                            jax.device_put(pts),
                            jax.device_put(words),
                            jax.device_put(tmT),
                        )
                    )
                ),
                4,
            )
            pts_d = jax.device_put(pts)
            words_d = jax.device_put(words)
            tmT_d = jax.device_put(tmT)
            jax.block_until_ready((pts_d, words_d, tmT_d))
            from versatiles_glyphs_tpu.ops.sdf_pallas import (
                render_bitmaps_pallas_pts,
            )

            # Kernel-only via the DIFFERENCE method (docs/
            # kernel_roofline.md): on this tunnel block_until_ready
            # returns at enqueue and the dispatch round-trip is ~25 ms,
            # so (T(25 dispatches + fetch) − T(5 + fetch)) / 20 cancels
            # both.
            def chain(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP)
                np.asarray(out[:1])
                return time.perf_counter() - t0

            chain(2)  # warm
            t_k = (chain(25) - chain(5)) / 20
            split["kernel_s"] = round(t_k, 4)
            split["kernel_mpix_per_s"] = round(n_pixels / t_k / 1e6, 2)
            keep = -(-T_used // 256) * 256

            def fetch_once():
                out_d = render_bitmaps_pallas_pts(pts_d, words_d, tmT_d, TP)
                np.asarray(out_d[:1])  # drain the kernel
                t0 = time.perf_counter()
                np.asarray(out_d[:keep])
                return time.perf_counter() - t0

            fetch_once()
            split["fetch_s"] = round(min(fetch_once() for _ in range(3)), 4)
            split["fetch_mb"] = round(keep * TP / 1e6, 2)
        except Exception as e:  # never sink the primary metric
            print(f"stage split skipped: {e!r}", file=sys.stderr)

    # i16-vs-f32 transport, end to end on the same workload (the
    # default-transport decision is data-driven: README "Parity").
    transport_cmp = {}
    if not interpret:
        try:
            for tr in ("i16", "f32"):
                rr = Renderer("tpu", transport=tr)
                rr.render_bitmaps(workload)  # warm
                tt = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    rr.render_bitmaps(workload)
                    tt = min(tt, time.time() - t0)
                transport_cmp[f"device_render_s_{tr}"] = round(tt / K, 4)
        except Exception as e:
            print(f"transport comparison skipped: {e!r}", file=sys.stderr)

    # Hardware parity gate for the DEFAULT transport (i16): every round
    # asserts max |Δ| ≤ 1 byte and ≤ 5% of pixels differing vs the
    # exact f64 reference on a sample, so transport regressions can't
    # hide behind the throughput number (README "Parity").
    bitmaps = renderer.render_bitmaps(preps)
    sample = range(0, len(preps), max(1, len(preps) // 120))
    worst, nbad, tot = 0, 0, 0
    for gi in sample:
        p = preps[gi]
        ex = render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
        delta = np.abs(
            np.asarray(bitmaps[gi], dtype=np.int32) - ex.astype(np.int32)
        )
        worst = max(worst, int(delta.max(initial=0)))
        nbad += int((delta > 0).sum())
        tot += delta.size
    parity_pct = 100.0 * nbad / max(tot, 1)
    assert worst <= 1, f"parity violation: max |delta| = {worst} > 1"
    assert parity_pct <= 5.0, f"parity violation: {parity_pct:.2f}% pixels differ"

    # End-to-end: the FULL production pipeline (parse → prep → device
    # render → PBF encode → write) through `FontManager.render_glyphs`,
    # K distinct font instances per run (each re-parsed, as in a real
    # multi-font recurse). This is the number a user's wall clock sees.
    from versatiles_glyphs_tpu.font.manager import FontManager
    from versatiles_glyphs_tpu.writer import Writer

    def e2e_run(k: int) -> float:
        mgr = FontManager()
        for i in range(k):
            mgr.add_font_with_name(f"fira {i}", [FIRA])
        w = Writer.new_dummy()
        t0 = time.time()
        mgr.render_glyphs(w, renderer)
        w.finish()
        return time.time() - t0

    K_e2e = 1 if interpret else 4
    e2e_run(1)  # warm shapes/compiles
    e2e_run(K_e2e)  # warm allocator/page-cache at the measured size
    t_e2e = min(e2e_run(K_e2e) for _ in range(3)) / K_e2e
    e2e_glyphs_per_s = len(entry.metadata.codepoints) / t_e2e

    # Differentiable path (BASELINE config 2): fwd+bwd Mpixels/s
    # through the custom-VJP Pallas pair (`ops/sdf_grad`) on the Fira
    # 0-255 block — control-point gradients of the SDF loss, the
    # fitting train step's inner work. Ten value_and_grad evaluations
    # are chained inside one jit (lax.scan) so the thin dev-tunnel's
    # ~25 ms dispatch round-trip amortizes away.
    fwd_bwd_mpix = None
    if not interpret:
        try:
            from versatiles_glyphs_tpu.models.fitting import (
                FontFitter,
                make_fit_batch,
            )

            cps = [cp for cp in entry.metadata.codepoints if cp < 256]
            fit_batch = make_fit_batch(entry, cps)
            # The FLAT kernel pair (r03): point-chain/tile-table layout,
            # argmin-oracle forward + O(P) envelope recompute backward
            # (`models.fitting.make_flat_kernel_loss`).
            fitter = FontFitter(depth=3, backend="pallas")
            params, _opt_state, dev = fitter.init(fit_batch)
            loss_fn = fitter._kernel_loss
            K_STEPS = 10

            @jax.jit
            def chained(p):
                def one(p, _):
                    loss, g = jax.value_and_grad(loss_fn)(p, dev)
                    # Tiny dependent update forces sequential execution.
                    p = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
                    return p, loss

                return jax.lax.scan(one, p, None, length=K_STEPS)

            chained(params)[1].block_until_ready()  # compile
            t0 = time.time()
            out = chained(params)
            out[1].block_until_ready()
            dt_step = (time.time() - t0) / K_STEPS
            real_pix = float(np.asarray(fit_batch.pix_mask).sum())
            fwd_bwd_mpix = real_pix / dt_step / 1e6
        except Exception as e:  # never sink the primary metric
            print(f"fwd+bwd bench skipped: {e!r}", file=sys.stderr)

    # Full-font fit step (every Fira glyph): the block workload above
    # is dominated by this harness's fixed per-step dispatch floor
    # (~2.5-4 ms — an EMPTY scan step costs that much through the
    # tunnel), so the amortized full-font figure is the one that
    # reflects the kernel pair.
    fwd_bwd_full_mpix = None
    if not interpret:
        try:
            fit_full = make_fit_batch(entry, list(entry.metadata.codepoints))
            fitter_f = FontFitter(depth=3, backend="pallas")
            params_f, _opt_f, dev_f = fitter_f.init(fit_full)
            loss_f = fitter_f._kernel_loss

            @jax.jit
            def chained_f(p):
                def one(p, _):
                    loss, g = jax.value_and_grad(loss_f)(p, dev_f)
                    p = jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
                    return p, loss

                return jax.lax.scan(one, p, None, length=K_STEPS)

            chained_f(params_f)[1].block_until_ready()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                out = chained_f(params_f)
                out[1].block_until_ready()
                best = min(best, (time.time() - t0) / K_STEPS)
            real_pix_f = float(np.asarray(fit_full.pix_mask).sum())
            fwd_bwd_full_mpix = real_pix_f / best / 1e6
        except Exception as e:
            print(f"full-font fwd+bwd bench skipped: {e!r}", file=sys.stderr)

    # Baseline: the reference-equivalent CPU renderer — the native
    # multithreaded bit-exact f64 implementation on the full font
    # (fallback: single-thread numpy on a sample).
    from versatiles_glyphs_tpu.proto import native

    if native.available():
        # Best of 2: the shared host's CPU throughput varies ~2× run to
        # run, which otherwise whipsaws vs_baseline.
        cpu_dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            native.render_sdf_batch(preps)
            cpu_dt = min(cpu_dt, time.time() - t0)
        cpu_glyphs_per_s = len(preps) / cpu_dt
        cpu_kind = "native-multicore"
    else:
        sample = preps[:: max(1, len(preps) // 40)][:40]
        t0 = time.time()
        for p in sample:
            render_sdf_exact(p.segments, p.width, p.height, p.x0, p.y0)
        cpu_dt = time.time() - t0
        cpu_glyphs_per_s = len(sample) / cpu_dt
        cpu_kind = "numpy-1thread-sample"

    result = {
        "metric": "sdf_render_glyphs_per_s",
        "value": round(glyphs_per_s, 1),
        "unit": "glyphs/s",
        "vs_baseline": round(glyphs_per_s / cpu_glyphs_per_s, 2),
    }
    detail = {
        "backend": backend,
        "interpret": interpret,
        "n_glyphs": n_glyphs,
        "mpixel_per_s": round(mpix_per_s, 2),
        "host_prep_s": round(t_prep, 3),
        "cpu_exact_glyphs_per_s": round(cpu_glyphs_per_s, 2),
        "cpu_baseline_kind": cpu_kind,
        "device_render_s_per_font": round(dt, 4),
        "e2e_s_per_font": round(t_e2e, 4),
        "e2e_glyphs_per_s": round(e2e_glyphs_per_s, 1),
        "e2e_vs_device_only": round(t_e2e / (dt if dt > 0 else 1), 2),
        "parity_i16_max_delta": worst,
        "parity_i16_pct_diff": round(parity_pct, 3),
        "fwd_bwd_mpix_per_s": (
            round(fwd_bwd_mpix, 2) if fwd_bwd_mpix is not None else None
        ),
        "fwd_bwd_full_mpix_per_s": (
            round(fwd_bwd_full_mpix, 2)
            if fwd_bwd_full_mpix is not None
            else None
        ),
        **split,
        **transport_cmp,
    }
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

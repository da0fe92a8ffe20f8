"""Paired e2e vs device-only probe with a stage timeline.

Measures, in one process and alternating windows (so both sides see
the same tunnel weather):
  - device-only: `Renderer.render_bitmaps` on the prepped workload
  - e2e: `FontManager.render_glyphs` on K re-parsed fonts

and prints per-phase wall clocks + the paired ratio. Used to attack
the r04 `e2e_vs_device_only` residual (VERDICT r05 ask 1).
"""

from __future__ import annotations

import sys
import time

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"
K = 8


def main() -> None:
    import jax

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.font.manager import FontManager
    from versatiles_glyphs_tpu.render.driver import Renderer
    from versatiles_glyphs_tpu.utils.device import enable_compilation_cache
    from versatiles_glyphs_tpu.writer import Writer

    enable_compilation_cache()
    print("backend:", jax.default_backend(), file=sys.stderr)

    with open(FIRA, "rb") as f:
        fira_bytes = f.read()

    renderer = Renderer("tpu")
    entry = FontFileEntry(fira_bytes)
    preps = []
    for cp in entry.metadata.codepoints:
        p = renderer.prep_glyph(entry, cp)
        if p is not None and not p.empty:
            preps.append(p)
    workload = preps * K
    n_cps = len(entry.metadata.codepoints)

    def dev_run():
        t0 = time.time()
        renderer.render_bitmaps(workload)
        return (time.time() - t0) / K

    def e2e_run(k=K):
        mgr = FontManager()
        for i in range(k):
            mgr.add_font_with_name(f"fira {i}", [FIRA])
        w = Writer.new_dummy()
        t0 = time.time()
        mgr.render_glyphs(w, renderer)
        w.finish()
        return (time.time() - t0) / k

    # Warm compiles/caches.
    dev_run()
    e2e_run(1)
    e2e_run()

    pairs = []
    for i in range(4):
        e = e2e_run()
        d = dev_run()
        pairs.append((e, d, e / d))
        print(
            f"pair {i}: e2e {e:.4f} s/font  device {d:.4f} s/font  "
            f"ratio {e / d:.3f}",
            file=sys.stderr,
        )
    best = min(p[2] for p in pairs)
    e_best = min(p[0] for p in pairs)
    print(
        f"best paired ratio {best:.3f}; best e2e {e_best:.4f} s/font = "
        f"{n_cps / e_best:.0f} glyphs/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

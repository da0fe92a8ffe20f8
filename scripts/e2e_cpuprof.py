"""Main-thread cProfile of `FontManager.render_glyphs` on the TPU
path — where does the e2e main thread actually spend its time?"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

FIRA = "/root/reference/testdata/Fira Sans - Regular.ttf"
K = 8


def main() -> None:
    from versatiles_glyphs_tpu.font.manager import FontManager
    from versatiles_glyphs_tpu.render.driver import Renderer
    from versatiles_glyphs_tpu.utils.device import enable_compilation_cache
    from versatiles_glyphs_tpu.writer import Writer

    enable_compilation_cache()
    renderer = Renderer("tpu")

    def e2e():
        mgr = FontManager()
        for i in range(K):
            mgr.add_font_with_name(f"fira {i}", [FIRA])
        w = Writer.new_dummy()
        t0, c0 = time.time(), time.process_time()
        mgr.render_glyphs(w, renderer)
        w.finish()
        return time.time() - t0, time.process_time() - c0

    e2e()
    e2e()
    wall, cpu = e2e()
    print(
        f"e2e {wall / K:.4f} s/font  cpu {cpu / K:.4f} s/font",
        file=sys.stderr,
    )
    pr = cProfile.Profile()
    pr.enable()
    wall, cpu = e2e()
    pr.disable()
    print(
        f"profiled e2e {wall / K:.4f} s/font  cpu {cpu / K:.4f} s/font",
        file=sys.stderr,
    )
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(22)
    print(s.getvalue()[:5000])


if __name__ == "__main__":
    main()

"""CLI end-to-end tests: recurse/merge/debug against temp dirs, flag
behavior, fonts.json manifests, tar output — the counterparts of
`src/commands/{recurse,merge,debug}.rs` inline tests."""

import io
import json
import os
import shutil
import tarfile

import pytest

import tests.conftest as C
from versatiles_glyphs_tpu.cli import main


def _ns(args, stdout):
    main(args, stdout=stdout)


def test_merge_directory_output(tmp_path):
    out = tmp_path / "out"
    _ns(
        ["merge", C.FIRA, "-o", str(out), "--dummy"],
        stdout=io.BytesIO(),
    )
    files = sorted(os.listdir(out))
    assert "index.json" in files
    assert "font_families.json" in files
    assert "fira_sans_regular" in files
    pbfs = sorted(os.listdir(out / "fira_sans_regular"))
    assert "0-255.pbf" in pbfs
    assert len(pbfs) == 20
    assert (out / "fira_sans_regular" / "0-255.pbf").stat().st_size == 80022
    assert json.loads((out / "index.json").read_text()) == ["fira_sans_regular"]


def test_merge_no_flags(tmp_path):
    out = tmp_path / "out"
    _ns(
        ["merge", C.FIRA, "-o", str(out), "--dummy", "--no-index", "--no-families"],
        stdout=io.BytesIO(),
    )
    files = sorted(os.listdir(out))
    assert "index.json" not in files
    assert "font_families.json" not in files


def test_recurse_with_fonts_json(tmp_path):
    d = tmp_path / "fonts"
    d.mkdir()
    shutil.copy(C.FIRA, d / "fira.ttf")
    (d / "fonts.json").write_text(
        json.dumps([{"name": "My Custom Font", "sources": ["fira.ttf"]}])
    )
    out = tmp_path / "out"
    _ns(["recurse", str(d), "-o", str(out), "--dummy"], stdout=io.BytesIO())
    assert json.loads((out / "index.json").read_text()) == ["my_custom_font"]
    assert (out / "my_custom_font" / "0-255.pbf").exists()


def test_recurse_plain_scan(tmp_path):
    d = tmp_path / "fonts" / "nested"
    d.mkdir(parents=True)
    shutil.copy(C.FIRA, d / "fira.ttf")
    (d / "ignored.txt").write_text("not a font")
    out = tmp_path / "out"
    _ns(["recurse", str(tmp_path / "fonts"), "-o", str(out), "--dummy"],
        stdout=io.BytesIO())
    assert json.loads((out / "index.json").read_text()) == ["fira_sans_regular"]


def test_recurse_tar_output(tmp_path):
    buf = io.BytesIO()
    _ns(["merge", C.FIRA, "--tar", "--dummy"], stdout=buf)
    tf = tarfile.open(fileobj=io.BytesIO(buf.getvalue()))
    names = tf.getnames()
    assert "fira_sans_regular" in names
    assert "fira_sans_regular/0-255.pbf" in names
    assert "index.json" in names
    m = tf.getmember("fira_sans_regular/0-255.pbf")
    assert m.size == 80022


def test_tar_and_output_dir_conflict(tmp_path):
    with pytest.raises(SystemExit):
        _ns(["merge", C.FIRA, "--tar", "-o", str(tmp_path / "x"), "--dummy"],
            stdout=io.BytesIO())


def test_debug_roundtrip(tmp_path):
    out = tmp_path / "out"
    _ns(["merge", C.FIRA, "-o", str(out), "--dummy"], stdout=io.BytesIO())
    s = io.StringIO()
    _ns(["debug", str(out / "fira_sans_regular")], stdout=s)
    lines = s.getvalue().strip().split("\n")
    assert lines[0] == "codepoint,width,height,left,top,advance,bitmap_size"
    rows = [l.split(",") for l in lines[1:]]
    cps = [int(r[0]) for r in rows]
    assert cps == sorted(cps)
    # Glyph 'A' (cp 65) metrics golden.
    row = next(r for r in rows if r[0] == "65")
    assert row == ["65", "14", "17", "0", "-7", "13", str((14 + 6) * (17 + 6))]
    # Space (cp 32): empty glyph.
    row = next(r for r in rows if r[0] == "32")
    assert row == ["32", "0", "0", "0", "0", "6", "0"]


def test_debug_missing_dir():
    with pytest.raises(SystemExit):
        _ns(["debug", "/nonexistent/dir"], stdout=io.StringIO())


def test_debug_tsv(tmp_path):
    out = tmp_path / "out"
    _ns(["merge", C.FIRA, "-o", str(out), "--dummy"], stdout=io.BytesIO())
    s = io.StringIO()
    _ns(["debug", str(out / "fira_sans_regular"), "--format", "tsv"], stdout=s)
    assert s.getvalue().startswith("codepoint\twidth\theight")


def test_manager_many_fonts_windowed_pool(tmp_path):
    """Scheduler robustness at fleet scale: 40 distinct synthesized
    fonts through the full pipelined render_glyphs (bounded prep
    window, per-font runs, block encode) — every font's block set must
    land, in a bounded-memory single pass."""
    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.font.manager import FontManager
    from versatiles_glyphs_tpu.font.names import name_to_id
    from versatiles_glyphs_tpu.font.wrapper import FontWrapper
    from versatiles_glyphs_tpu.render.driver import Renderer
    from versatiles_glyphs_tpu.utils.synth_font import build_ttf
    from versatiles_glyphs_tpu.writer import DummyWriter

    mgr = FontManager()
    for i in range(40):
        font = build_ttf(n_glyphs=3 + (i % 5))
        entry = FontFileEntry(font)
        fid = f"{name_to_id(entry.metadata.generate_name())}_{i}"
        mgr.fonts[fid] = FontWrapper()
        mgr.fonts[fid].add_file(entry)

    w = DummyWriter()
    mgr.render_glyphs(w, Renderer("zeros"))
    lines = w.get_inner()
    dirs = [l for l in lines if l.endswith("/")]
    pbfs = [l for l in lines if ".pbf" in l]
    assert len(dirs) == 40
    assert len(pbfs) >= 40  # every font wrote at least one block
    # Every font id appears among the written files.
    for fid in mgr.fonts:
        assert any(l.startswith(f"{fid}/") for l in pbfs), fid

"""Writer tests: tar byte layout (verified against Python's tarfile, the
counterpart of the reference verifying with the real `tar` crate),
header offsets (`src/writer/tar.rs:189-285`), file/dummy writers."""

import io
import tarfile

import pytest

from versatiles_glyphs_tpu.writer import DummyWriter, Writer
from versatiles_glyphs_tpu.writer.tar import TarWriter, build_header


def test_tar_header_layout():
    h = build_header("hello.txt", 5, 0o644, ord("0"), mtime=1700000000)
    assert h[0:9] == b"hello.txt"
    assert h[9] == 0
    # Mode: zero-filled right-aligned octal, space-terminated.
    assert h[100:108] == b"0000644 "
    assert h[108:116] == b"0000000 "
    # Size 5 in 12-byte octal field.
    assert h[124:136] == b"00000000005 "
    assert h[156] == ord("0")
    assert h[257:263] == b"ustar\0"
    assert h[263:265] == b"00"
    # Checksum is valid: sum with checksum field spaced.
    spaced = bytearray(h)
    spaced[148:156] = b" " * 8
    assert int(h[148:155], 8) == sum(spaced)


def test_tar_name_too_long():
    with pytest.raises(ValueError):
        build_header("x" * 101, 0, 0o644, ord("0"))


def test_tar_roundtrip_with_tarfile():
    buf = io.BytesIO()
    w = Writer.new_tar(buf)
    w.write_directory("fonts/")
    w.write_file("fonts/a.pbf", b"hello world")
    w.write_file("empty.bin", b"")
    w.write_file("big.bin", bytes(513))
    w.finish()
    data = buf.getvalue()
    assert len(data) % 512 == 0
    tf = tarfile.open(fileobj=io.BytesIO(data))
    names = tf.getnames()
    assert names == ["fonts", "fonts/a.pbf", "empty.bin", "big.bin"]
    m = tf.getmember("fonts")
    assert m.isdir() and m.mode == 0o755
    f = tf.getmember("fonts/a.pbf")
    assert f.isfile() and f.size == 11 and f.mode == 0o644
    assert tf.extractfile("fonts/a.pbf").read() == b"hello world"
    assert tf.extractfile("big.bin").read() == bytes(513)


def test_tar_dir_requires_slash():
    w = TarWriter(io.BytesIO())
    with pytest.raises(ValueError):
        w.write_directory("nodir")


def test_file_writer(tmp_path):
    w = Writer.new_file(str(tmp_path))
    w.write_directory("sub/")
    w.write_file("sub/x.pbf", b"abc")
    w.finish()
    assert (tmp_path / "sub").is_dir()
    assert (tmp_path / "sub" / "x.pbf").read_bytes() == b"abc"


def test_dummy_writer():
    w = DummyWriter()
    w.write_directory("subdir/")
    w.write_file("data.pbf", bytes(42))
    w.write_file("index.json", b'[\n  "a",\n  "b"\n]')
    assert w.get_inner() == [
        "subdir/",
        "data.pbf (42)",
        'index.json: ["a","b"]',
    ]


def test_writer_finish_idempotent():
    buf = io.BytesIO()
    w = Writer.new_tar(buf)
    w.finish()
    w.finish()
    assert len(buf.getvalue()) == 1024

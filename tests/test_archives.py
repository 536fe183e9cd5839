"""Archive container source/sink (sources/archives.py)."""

from __future__ import annotations

import glob

import pytest

from razulibs_spark.sources.archives import (
    _tar_members,
    _zip_members,
    read_tar,
    read_zip,
    write_tar_gz_shards,
    write_zip_shards,
)


def _members_df(spark, n=6):
    return spark.createDataFrame(
        [(f"doc-{i}.txt", f"payload {i} bytes".encode()) for i in range(n)],
        "member string, body binary",
    )


def test_zip_roundtrip_deterministic_and_strict(spark, tmp_path):
    out1, out2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    df = _members_df(spark).repartition(2)
    write_zip_shards(df, out1)
    write_zip_shards(df, out2)
    # byte-determinism: identical input -> identical shard bytes
    a = sorted(glob.glob(out1 + "/*.zip"))
    b = sorted(glob.glob(out2 + "/*.zip"))
    assert [open(p, "rb").read() for p in a] == [
        open(p, "rb").read() for p in b
    ]
    got = {r["member"]: r for r in read_zip(spark, out1).collect()}
    assert len(got) == 6
    assert bytes(got["doc-3.txt"]["body"]) == b"payload 3 bytes"
    assert got["doc-3.txt"]["compressed"] is True
    assert got["doc-3.txt"]["size"] == len(b"payload 3 bytes")
    # stored (uncompressed) members round-trip too and say so
    out3 = str(tmp_path / "z3")
    write_zip_shards(df, out3, compress=False)
    r = read_zip(spark, out3).collect()[0]
    assert r["compressed"] is False
    with pytest.raises(ValueError, match="zip:"):
        _zip_members("bad.zip", b"PK\x03\x04 not a real zip")


def test_tar_gz_roundtrip_and_strictness(spark, tmp_path):
    out1, out2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    df = _members_df(spark).repartition(2)
    write_tar_gz_shards(df, out1)
    write_tar_gz_shards(df, out2)
    a = sorted(glob.glob(out1 + "/*.tar.gz"))
    assert a and all(
        open(p, "rb").read(2) == b"\x1f\x8b" for p in a
    )  # really gzip-wrapped
    assert [open(p, "rb").read() for p in a] == [
        open(p, "rb").read() for p in sorted(glob.glob(out2 + "/*.tar.gz"))
    ]
    got = {r["member"]: r for r in read_tar(spark, out1).collect()}
    assert len(got) == 6
    assert bytes(got["doc-5.txt"]["body"]) == b"payload 5 bytes"
    assert got["doc-5.txt"]["compressed"] is False
    # NB an all-zeros buffer is legally an EMPTY tar (the end-of-
    # archive marker), not corruption:
    assert _tar_members("empty.tar", b"\x00" * 2048) == []
    with pytest.raises(ValueError, match="tar:"):
        _tar_members("bad.tar", b"definitely not a tar header" * 64)


def test_tar_members_skip_directories():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        f = tarfile.TarInfo("subdir/x.txt")
        body = b"inner"
        f.size = len(body)
        tf.addfile(f, io.BytesIO(body))
    rows = _tar_members("a.tar", buf.getvalue())
    assert [(r[1], r[4]) for r in rows] == [("subdir/x.txt", b"inner")]

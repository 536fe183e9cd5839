"""Archive container source/sink (ZIP + tar.gz) — the packaging real
corpora arrive in: academic dumps and Kaggle-style datasets ship as
.zip, crawl and log dumps as .tar.gz, and the reference's own archival
domain moves SIPs as zipped transfer packages. The engine's job is the
DISTRIBUTION shape, not the codec (stdlib zipfile/tarfile are the
codec): per-FILE binaryFile tasks — archive shards are the natural
parallelism unit exactly like WARC files — and one Arrow stage that
explodes each archive into (archive, member, body) rows.

Sinks write one archive per partition from the executors (the
write_warc_records contract), byte-deterministic: member timestamps
pinned to the epoch (ZIP's 1980-01-01 floor / tar mtime 0), fixed
uid/gid, and the tar's gzip wrapper via gzip_member (mtime=0) — a
given input produces identical archive bytes, which is what lets the
oracle hash the roundtrip.

Strictness: a corrupt central directory / tar header raises ValueError
naming the archive defect — ingest gate, not silent drop.
"""

from __future__ import annotations

import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ARCHIVE_MEMBER_SCHEMA = StructType(
    [
        StructField("archive", StringType(), False),  # file basename
        StructField("member", StringType(), False),
        StructField("size", LongType(), False),
        StructField("compressed", BooleanType(), False),
        StructField("body", BinaryType(), False),
    ]
)


def _zip_members(name: str, content: bytes) -> list[tuple]:
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(content))
        rows = []
        for info in zf.infolist():
            if info.is_dir():
                continue
            rows.append(
                (
                    name,
                    info.filename,
                    info.file_size,
                    info.compress_type != zipfile.ZIP_STORED,
                    zf.read(info),
                )
            )
        return rows
    except zipfile.BadZipFile as exc:
        raise ValueError(f"zip: {name}: {exc}") from exc


def _tar_members(name: str, content: bytes) -> list[tuple]:
    import tarfile

    try:
        tf = tarfile.open(fileobj=io.BytesIO(content))
        rows = []
        for info in tf.getmembers():
            if not info.isfile():
                continue
            fh = tf.extractfile(info)
            body = fh.read() if fh else b""
            # tar itself never compresses members; the .gz wraps the
            # whole stream — report per-member compressed=False
            rows.append((name, info.name, info.size, False, body))
        return rows
    except tarfile.TarError as exc:
        raise ValueError(f"tar: {name}: {exc}") from exc


def _read_archives(
    spark: SparkSession, path: str, glob: str, parse
) -> DataFrame:
    import os

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ARCHIVE_MEMBER_SCHEMA.fields]
        for pdf in it:
            rows: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                if b:
                    rows.extend(parse(os.path.basename(p), b))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
        .mapInPandas(batches, schema=ARCHIVE_MEMBER_SCHEMA)
    )


def read_zip(spark: SparkSession, path: str) -> DataFrame:
    """ZIP shard tree → one row per member. Per-archive tasks."""
    return _read_archives(spark, path, "*.zip", _zip_members)


def read_tar(spark: SparkSession, path: str) -> DataFrame:
    """tar[.gz] shard tree → one row per member. Per-archive tasks."""
    return _read_archives(spark, path, "*.tar*", _tar_members)


def write_zip_shards(
    df: DataFrame,
    directory: str,
    member_col: str = "member",
    payload_col: str = "body",
    compress: bool = True,
) -> None:
    """One ``part-<partition>.zip`` per partition, executor-side.
    Deterministic bytes: member timestamps pinned to ZIP's 1980 epoch
    floor, deflate level fixed by zlib's default."""
    import os
    import zipfile

    os.makedirs(directory, exist_ok=True)
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        buf = io.BytesIO()
        pid = None
        with zipfile.ZipFile(buf, "w", method) as zf:
            for row in rows:
                pid = TaskContext.get().partitionId() if pid is None else pid
                info = zipfile.ZipInfo(
                    row[member_col], date_time=(1980, 1, 1, 0, 0, 0)
                )
                info.compress_type = method
                info.external_attr = 0o644 << 16
                zf.writestr(info, bytes(row[payload_col]))
        if pid is not None:
            with open(
                os.path.join(directory, f"part-{pid:05d}.zip"), "wb"
            ) as fh:
                fh.write(buf.getvalue())

    df.select(member_col, payload_col).foreachPartition(write_partition)


def write_tar_gz_shards(
    df: DataFrame,
    directory: str,
    member_col: str = "member",
    payload_col: str = "body",
) -> None:
    """One ``part-<partition>.tar.gz`` per partition, executor-side.
    The tar stream is built uncompressed (mtime/uid/gid pinned to 0)
    and wrapped by gzip_member (mtime=0) — fully deterministic, unlike
    tarfile's 'w:gz' which stamps the wall clock into the gzip
    header."""
    import os
    import tarfile

    from razulibs_spark.sources.warc import gzip_member

    os.makedirs(directory, exist_ok=True)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        buf = io.BytesIO()
        pid = None
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for row in rows:
                pid = TaskContext.get().partitionId() if pid is None else pid
                body = bytes(row[payload_col])
                info = tarfile.TarInfo(row[member_col])
                info.size = len(body)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(body))
        if pid is not None:
            with open(
                os.path.join(directory, f"part-{pid:05d}.tar.gz"), "wb"
            ) as fh:
                fh.write(gzip_member(buf.getvalue()))

    df.select(member_col, payload_col).foreachPartition(write_partition)

"""Multimodal-column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extract run as Arrow-batched
`mapInPandas` stages. The actual media decode is STUBBED (the
image/audio libraries are not in this container): `decode_image`
raises NotImplementedError, and the pipeline uses a deterministic
fake feature extractor instead — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_format", StringType(), True),
        StructField("declared_width", LongType(), True),
        StructField("declared_height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("payload_md5", StringType(), True),
        StructField("media_format", StringType(), True),
        StructField("thumb_width", LongType(), True),
        StructField("thumb_height", LongType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real media decode — intentionally not implemented in this
    container (no imaging libraries). The distributed pipeline around
    it is real; swap this for PIL/opencv on a full cluster image."""
    raise NotImplementedError(
        "media decode requires an imaging library not present in this "
        "environment; the pipeline uses extract_features_stub instead"
    )


def attach_media_columns(documents: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata from the
    documents table (stands in for `binaryFile` content at scale)."""
    fmt = F.when((F.col("doc_id") % 3) == 0, F.lit("image/jpeg")).when(
        (F.col("doc_id") % 3) == 1, F.lit("image/png")
    ).otherwise(F.lit("audio/wav"))
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        fmt.alias("media_format"),
        (F.col("n_chars") % 1024 + 16).cast("long").alias("declared_width"),
        (F.col("n_chars") % 768 + 16).cast("long").alias("declared_height"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams record batches through Python once — the shape
    a real decode/resize/frame-sample stage takes. The per-payload
    work here is a deterministic fake (length + md5 + 16:9 thumb box)
    standing in for the stubbed decode_image.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "media_format": pdf["media_format"],
                    "thumb_width": (pdf["declared_width"].clip(upper=256)),
                    "thumb_height": (pdf["declared_width"].clip(upper=256) * 9 // 16),
                }
            )

    n = media.sparkSession.sparkContext.defaultParallelism
    return media.repartition(n, "doc_id").mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_format", StringType(), True),
        StructField("out_width", LongType(), True),
        StructField("out_height", LongType(), True),
        StructField("resized_md5", StringType(), True),
    ]
)


def resize_images(media: DataFrame, box: int = 256) -> DataFrame:
    """Image-resize stage: aspect-fit each image into a box×box square
    (integer floor arithmetic — deterministic and oracle-expressible).
    The pixel resample itself needs the stubbed decode (decode_image);
    the fake keeps md5(payload) as the stand-in for the resized bytes.
    Non-image rows are filtered before the Python boundary so the
    Arrow transfer only carries the rows the stage will touch."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w = pdf["declared_width"].astype("int64")
            h = pdf["declared_height"].astype("int64")
            landscape = w >= h
            out_w = landscape * box + (~landscape) * (w * box // h)
            out_h = landscape * (h * box // w) + (~landscape) * box
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "resized_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    n = media.sparkSession.sparkContext.defaultParallelism
    images = media.filter(F.col("media_format").startswith("image/"))
    return images.repartition(n, "doc_id").mapInPandas(batches, schema=RESIZE_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("chunk_md5", StringType(), True),
    ]
)


def chunk_audio(media: DataFrame, chunk_bytes: int = 128) -> DataFrame:
    """Audio-chunking stage (audio path of the multimodal north star):
    fixed-size payload windows, one output row per chunk — the same
    UDTF-shaped mapInPandas fan-out as sample_frames, restricted to
    audio rows before the Python boundary. Real sample-accurate
    chunking needs the stubbed decode; the deterministic fake hashes
    byte windows."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_chunks = (len(payload) + chunk_bytes - 1) // chunk_bytes
                for i in range(n_chunks):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(
                            payload[i * chunk_bytes:(i + 1) * chunk_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "chunk_md5": hashes}
            )

    n = media.sparkSession.sparkContext.defaultParallelism
    audio = media.filter(F.col("media_format").startswith("audio/"))
    return audio.repartition(n, "doc_id").mapInPandas(batches, schema=CHUNK_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame-sampling stage (video path of the multimodal north star):
    one input payload fans out to every `every`-th frame. Real frame
    extraction needs a video library (stubbed, like decode_image); the
    deterministic fake treats each 1 KiB payload slice as one frame and
    hashes the sampled slices. The Spark shape is the real one: a
    mapInPandas generator whose output batch is LONGER than its input
    (UDTF-shaped fan-out), partitioned by doc_id upstream."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // 1024)
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(payload[i * 1024:(i + 1) * 1024]).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_md5": hashes})

    n = media.sparkSession.sparkContext.defaultParallelism
    return media.repartition(n, "doc_id").mapInPandas(batches, schema=FRAME_SCHEMA)

"""Dense sequential id assignment — SURVEY.md O1 (razu/incrementer.py).

Two implementations:

- `dense_ids` — the scalable two-phase scheme: range-repartition on
  the order key (a parallel sort), count rows per partition, broadcast
  the tiny offset table, and number rows within each partition. No
  single-partition global window; the only driver traffic is one
  integer per partition.

- `dense_ids_global_window` — the naive row_number().over(global
  window) form, kept for comparison/testing; it funnels all rows
  through one task and must not be used at scale.

For 100 TB pipelines prefer content-derived uids (md5 of the natural
key, functions/scalars.razu_uid over a hash) — dense ids exist for
SIP-compatible output only (SURVEY §2.9 design note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    start: int = 1,
    n_parts: int | None = None,
) -> DataFrame:
    """Assign dense ids 'start, start+1, …' in the total order given by
    order_cols (must be a total order — include a unique tie-break).

    ``n_parts`` overrides the range-partition fan-out: callers that
    know the input is dimension-sized (e.g. ntile_scalable over a
    per-user aggregate) pass a small width so a 1k-row sort doesn't
    schedule defaultParallelism tasks across three stages."""
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # persist() pins ONE materialization of the range partitioning:
    # repartitionByRange SAMPLES its bounds per job, so without the
    # pin the counts job and the numbering job could see different
    # partition boundaries and the offsets would misalign.
    parted = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # One count per partition — tiny driver collect, then broadcast back.
    counts = (
        parted.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets, acc = [], start
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    offsets_df = df.sparkSession.createDataFrame(offsets, ["_pid", "_offset"])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        parted.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )


def dense_ids_global_window(
    df: DataFrame, order_cols: list[str], id_col: str, start: int = 1
) -> DataFrame:
    """Single-partition reference implementation (do not use at scale)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        id_col, (F.row_number().over(w) - 1 + start).cast("long")
    )

"""Model-evaluation reporting operators: the metrics a pipeline that
classifies / filters 100 TB of data publishes about its own models
(language-ID, quality gates, dedup verdicts) — confusion matrices and
per-class rates computed set-at-a-time.

Scale shape: everything here reduces to count aggregates keyed by
(label, prediction) — map-side combinable, output bounded by the
class-vocabulary square, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """(label, prediction) confusion counts with per-label recall
    fractions: one count aggregate over the predictions table, one
    |classes|-sized rollup joined back. The diagonal's ``frac`` column
    is per-class recall; column-sums of ``n`` give per-class predicted
    mass for precision.
    """
    m = df.groupBy(label_col, pred_col).agg(F.count("*").alias("n"))
    totals = m.groupBy(label_col).agg(F.sum("n").alias("n_labeled"))
    return m.join(totals, label_col).select(
        label_col,
        pred_col,
        "n",
        "n_labeled",
        F.round(F.col("n").cast("double") / F.col("n_labeled"), 6).alias(
            "frac"
        ),
    )

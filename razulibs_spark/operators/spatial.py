"""Grid-binned 2-D spatial join — point-in-rectangle containment at
scale without a cross product. The reference's only geo operation is
the RD→WGS84 bbox construction (demo/csv_luchtfotos/extra.py:29-40,
engine: functions/scalars.py F10/F12); this operator is the join those
bboxes exist FOR: assigning points (events, observations, photo
centroids) to covering regions.

The classic distribution strategy (the PBSM/grid family every
distributed spatial engine uses): overlay a uniform grid; each
rectangle replicates to every cell it overlaps (bounded fan-out —
ceil(w/cell)·ceil(h/cell) cells), each point lands in EXACTLY ONE
cell, the join becomes an equi-join on the cell key, and an exact
containment filter removes the false positives cell granularity
admits. Because a point owns one cell, a (point, box) pair can only
meet in that cell — no post-join dedup, no double counting. All of it
is codegen (sequence/explode/floor/equi-join/filter): no UDF, no
CartesianProduct, shuffle keyed by cell ids that spread uniformly by
construction.

Cell size tuning is the usual trade: cells ≫ boxes → high false-
positive filter load; cells ≪ boxes → high replication. The default
suits region-sized boxes; callers with skewed box sizes pick per-call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_spatial_join(
    points: DataFrame,
    boxes: DataFrame,
    cell: float = 10.0,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """points(…, x, y) ⋈ boxes(…, xmin, ymin, xmax, ymax) on
    half-open containment (xmin ≤ x < xmax, ymin ≤ y < ymax) — one
    output row per containing (point, box) pair, all input columns
    kept. Half-open edges make adjacent boxes partition the plane
    without double-assigning boundary points."""
    cells = boxes.withColumn(
        "cx",
        F.explode(
            F.sequence(
                F.floor(F.col("xmin") / cell),
                # xmax is EXCLUSIVE: a box ending exactly on a cell
                # edge does not reach into the next cell
                F.floor(
                    (F.col("xmax") - F.lit(1e-9)) / cell
                ),
            )
        ),
    ).withColumn(
        "cy",
        F.explode(
            F.sequence(
                F.floor(F.col("ymin") / cell),
                F.floor((F.col("ymax") - F.lit(1e-9)) / cell),
            )
        ),
    )
    pts = points.withColumn(
        "cx", F.floor(F.col(x) / cell)
    ).withColumn("cy", F.floor(F.col(y) / cell))
    return (
        pts.join(cells, ["cx", "cy"])
        .filter(
            (F.col(x) >= F.col("xmin"))
            & (F.col(x) < F.col("xmax"))
            & (F.col(y) >= F.col("ymin"))
            & (F.col(y) < F.col("ymax"))
        )
        .drop("cx", "cy")
    )

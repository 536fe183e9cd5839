"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the correctness baseline; an IVF-style
nearest-centroid partitioner as the scale path (bucket first, search
within bucket — turns O(N·Q) into O(N·Q/√buckets) with pre-partitioned
buckets co-locating candidates).

All dot products run JVM-side via zip_with + aggregate over
double-cast arrays (float→double is exact, the left-to-right fold is
deterministic); similarities are rounded before output so the DuckDB
oracle (list_cosine_similarity over DOUBLE[]) matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _with_vec(embeddings: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    return embeddings.select(
        F.col("vec_id").alias(id_alias), as_double(F.col("embedding")).alias(vec_alias)
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Brute-force top-k: for every query vector, the k most cosine-
    similar non-self vectors. The query side is broadcast (small);
    the corpus side streams — no shuffle of the big table."""
    q = _with_vec(queries, "query_id", "qv")
    c = _with_vec(embeddings, "neighbor_id", "cv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("_cos", 6).alias("cosine"))
    )


def near_duplicate_pairs(embeddings: DataFrame, threshold: float) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (embedding near-dup).

    Brute force O(N²/2) — correct baseline; at scale restrict the join
    with `ivf_assign` buckets (equal-bucket equi-join) first.
    """
    a = _with_vec(embeddings, "v1", "av")
    b = _with_vec(embeddings, "v2", "bv")
    return (
        a.crossJoin(b)
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", F.round(cosine(F.col("av"), F.col("bv")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF-style bucket assignment: each vector goes to its most
    cosine-similar centroid (broadcast the small centroid set, argmax
    via row_number). Downstream ANN joins become per-bucket joins."""
    c = _with_vec(centroids, "centroid_id", "cv")
    v = _with_vec(embeddings, "vec_id", "vv")
    scored = v.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "centroid_id",
        cosine(F.col("vv"), F.col("cv")).alias("_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )

"""Deterministic sampling / splitting operators for training-data
pipelines (BASELINE.json north star — data management a 100 TB corpus
pipeline needs).

Everything here is *hash-derived*, never RNG-derived: at cluster scale
a sample must be (a) reproducible across runs and engines, (b)
independent of partitioning/row order, and (c) computable without any
shuffle — a pure projection the optimizer can pipeline into the scan.
`rand(seed)` fails (a)+(b) on Spark (seed is per-partition), so we use
a Knuth multiplicative hash over the stable key in exact BIGINT
arithmetic, which any engine reproduces bit-for-bit.

At 100 TB: these are narrow map-side transforms — no shuffle, no
driver state; the split column can feed `partitionBy` at write time so
each split lands in its own directory tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Knuth's 2^32 golden-ratio multiplier; exact in int64 for keys < ~4e9.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def bucket_of(key: Column, salt: int = 0, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): multiplicative hash in
    exact 64-bit integer arithmetic (engine-portable, order-stable)."""
    h = ((key + F.lit(salt)) * F.lit(_KNUTH)) % F.lit(_MOD)
    return (h % F.lit(buckets)).cast("int")


def bucket_sql(key: str, salt: int = 0, buckets: int = 100) -> str:
    """The DuckDB-equivalent expression for :func:`bucket_of`."""
    return f"CAST((({key} + {salt}) * {_KNUTH}) % {_MOD} % {buckets} AS INT)"


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split: bucket the key into 100
    cells, carve [0,train), [train,train+val), [train+val,100).

    A pure projection — Catalyst pipelines it into the scan; writing
    with ``partitionBy('split')`` gives per-split datasets without a
    shuffle (round-robin file assignment only).
    """
    b = bucket_of(F.col(key), salt=salt)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum: str = "lang",
    key: str = "doc_id",
    default_pct: int = 100,
    salt: int = 1,
) -> DataFrame:
    """Deterministic stratified downsample: keep a row when its hash
    bucket falls below the stratum's percentage (e.g. downsample the
    dominant language of a crawl to balance a training mix).

    Map-side only: the per-stratum rate is a CASE expression, the
    predicate is pushed into the scan — no shuffle, no RNG.
    """
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket_of(F.col(key), salt=salt) < rate)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    salt: int = 2,
) -> DataFrame:
    """Target-mixture resampling: downsample each source so the kept
    corpus approaches the requested mixture proportions at the largest
    size the minority sources allow.

    Training-data curation fixes a mixture (web 50%, books 30%, code
    20%) rather than per-source rates: the achievable total is
    T = min over sources of n_s / p_s (the most-constraining source is
    kept whole), and every other source is hash-thinned to rate
    T·p_s / n_s. Sources absent from ``weights`` are dropped. The
    acceptance test is the same Knuth multiplicative hash as
    :func:`bucket_of` at 2³² granularity — reproducible across runs,
    engines, and partitionings, so the sample is a deterministic SET,
    not an expected fraction of a shuffled order.

    Scale shape: one tiny per-source count aggregate (broadcast back),
    then a map-side filter — the corpus itself is never shuffled. The
    per-source kept count is binomial around T·p_s (hash-thinning, not
    exact rank cutting); an exact-count variant would need a
    per-source ROW_NUMBER window over the hash — a full sort per
    source for a mixture that training runs only ever specify
    approximately.
    """
    spark_weights = F.create_map(
        *[x for s, p in sorted(weights.items()) for x in (F.lit(s), F.lit(p))]
    )
    annotated = df.withColumn("_p", spark_weights[F.col(source_col)]).filter(
        F.col("_p").isNotNull()
    )
    per_source = annotated.groupBy(source_col, "_p").agg(
        F.count("*").alias("_n")
    )
    cutoffs = (
        per_source.withColumn(
            "_t", F.min(F.col("_n") / F.col("_p")).over(Window.partitionBy())
        )
        .withColumn(
            "_cutoff",
            F.floor(F.col("_t") * F.col("_p") / F.col("_n") * F.lit(_MOD))
            .cast("long"),
        )
        .select(source_col, "_cutoff")
    )
    h = ((F.col(key) + F.lit(salt)) * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        annotated.drop("_p")
        .join(F.broadcast(cutoffs), source_col)
        .filter(h < F.col("_cutoff"))
        .drop("_cutoff")
    )


def temperature_mix(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
    tokens_col: str = "n_chars",
    key: str = "doc_id",
    salt: int = 3,
) -> DataFrame:
    """Temperature-based mixture re-balancing at T=2 (α=0.5): sample
    each group at a rate proportional to sqrt(group token mass), the
    standard multilingual / multi-domain flattening used when training
    mixes would otherwise be dominated by the largest sources.

    Group g with ``tok_g`` tokens gets weight w_g = √tok_g / Σ√tok_h
    and keep-rate min(1, budget·w_g / tok_g): small groups are kept
    whole, large groups are thinned toward the α-powered share of the
    token ``budget``. α is fixed at 0.5 because IEEE-754 sqrt is
    correctly rounded — every engine computes bit-identical weights
    (arbitrary pow(x, α) is not, so cross-engine cutoffs could differ
    by one hash cell). The √tok values are scaled to exact BIGINTs
    before the normalizing sum, keeping the whole rate computation
    summation-order independent.

    Scale shape: one tiny per-group aggregate (groups ≈ languages or
    sources, thousands at most), broadcast back, then the same
    map-side Knuth-hash acceptance filter as :func:`mixture_sample` —
    the corpus is never shuffled. Output adds the per-group keep-rate
    so the sampled set is self-describing.
    """
    per_group = df.groupBy(group_col).agg(
        F.sum(tokens_col).alias("_tok")
    )
    scaled_sqrt = F.floor(F.sqrt(F.col("_tok")) * F.lit(10**6) + F.lit(0.5))
    # budget·_st and _denom·_tok overflow int64 on real corpora
    # (_denom·_tok ≥ 1e6·tok^1.5 passes 2^63 at ~4.4e8 tokens): take
    # both products in decimal(38,0) — exact, the int128 twin of the
    # oracle's HUGEINT — and drop to double only for the division.
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cutoffs = (
        per_group.withColumn("_st", scaled_sqrt.cast("long"))
        .withColumn(
            "_denom", F.sum("_st").over(Window.partitionBy())
        )
        .withColumn(
            "_rate",
            F.least(
                F.lit(1.0),
                (dec(F.lit(budget_tokens)) * dec(F.col("_st"))).cast("double")
                / (dec(F.col("_denom")) * dec(F.col("_tok"))).cast("double"),
            ),
        )
        .withColumn(
            "_cutoff", F.floor(F.col("_rate") * F.lit(_MOD)).cast("long")
        )
        .select(group_col, F.round("_rate", 6).alias("keep_rate"), "_cutoff")
    )
    h = ((F.col(key) + F.lit(salt)) * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        df.join(F.broadcast(cutoffs), group_col)
        .filter(h < F.col("_cutoff"))
        .drop("_cutoff")
    )


def source_cap(
    documents: DataFrame,
    cap: int = 20,
    group_col: str = "source",
) -> DataFrame:
    """Per-source document cap — the host/domain frequency capping
    step of C4 / RefinedWeb-style curation: keep at most ``cap``
    documents per source, best quality first (`text.quality_scores`,
    ties broken by lowest doc_id), so one over-crawled host cannot
    dominate the training mix.

    Scale shape: the rank window is KEYED by source — one shuffle on
    the group key, per-key state bounded by that source's row count,
    no global sort. At 100 TB with mega-hosts, swap the window for
    the two-phase top-k (`t_grouped_topk` pattern) or pre-aggregate
    per (source, hash-salt) — the plan here stays the keyed-window
    reference semantics. The output keeps `rank_in_source` so the
    cap is auditable downstream.

    Reference has no counterpart (LLM-pipeline north star;
    BASELINE.json).
    """
    from razulibs_spark.operators.text import quality_score_col

    ranked = documents.select(
        "doc_id", group_col, quality_score_col().alias("quality_score")
    ).withColumn(
        "rank_in_source",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col("quality_score").desc(), F.col("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rank_in_source") <= cap).select(
        "doc_id",
        group_col,
        "quality_score",
        F.col("rank_in_source").cast("long").alias("rank_in_source"),
    )


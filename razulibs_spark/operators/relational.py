"""Relational operator library — SURVEY.md §2.2/§2.3/§2.7 (P/J/U ops).

Generic, table-agnostic building blocks. All are pure DataFrame
transformations: Catalyst pushes the predicates into the scans and
picks broadcast vs sort-merge per side size (AQE re-plans at runtime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reconcile_full_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    check: str,
    left_name: str = "manifest",
    right_name: str = "filesystem",
) -> DataFrame:
    """Manifest ↔ filesystem reconcile (J4; razu/manifest.py:185-221).

    Full-outer join on `key`, bucketing every row into
    'missing' (left only), 'extra' (right only), 'mismatch' (differing
    `check` value) or 'ok'. One shuffle on the key; at scale both
    sides arrive hash-partitioned so AQE coalesces the output.
    """
    lhs = left.select(F.col(key), F.col(check).alias("_l_check"))
    rhs = right.select(F.col(key), F.col(check).alias("_r_check"))
    joined = lhs.join(rhs, key, "full_outer")
    status = (
        F.when(F.col("_r_check").isNull(), F.lit("missing"))
        .when(F.col("_l_check").isNull(), F.lit("extra"))
        .when(F.col("_l_check") != F.col("_r_check"), F.lit("mismatch"))
        .otherwise(F.lit("ok"))
    )
    return joined.select(F.col(key), status.alias("status"))


def changed_or_new(
    source: DataFrame, target: DataFrame, key: str, check: str
) -> DataFrame:
    """Incremental-sync diff (J5; tools/sip2localstorage.py:69-94,
    razu/edepot.py:87-106): rows of `source` whose key is absent from
    `target` or whose `check` value differs — a left-anti join on
    (key, check)."""
    return source.join(
        target.select(key, check), on=[key, check], how="left_anti"
    )


def set_diff_both(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Two-direction key diff (J6/U3; logs/compare_manifest_to_s3.py:13-25):
    keys only in `a` tagged 'only_a', keys only in `b` tagged 'only_b'."""
    only_a = (
        a.select(key).distinct().join(b.select(key).distinct(), key, "left_anti")
        .withColumn("side", F.lit("only_a"))
    )
    only_b = (
        b.select(key).distinct().join(a.select(key).distinct(), key, "left_anti")
        .withColumn("side", F.lit("only_b"))
    )
    return only_a.unionByName(only_b)


def upsert_by_key(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Last-wins key upsert (U4; razu/manifest.py:128-147):
    `new ∪ (old ⟕anti new)`. The Delta-MERGE shape without Delta."""
    return new.unionByName(old.join(new.select(key), key, "left_anti"))


def top_k(df: DataFrame, k: int, order: list[Column]) -> DataFrame:
    """Deterministic top-k (T-ops): callers must give a total order
    (include a unique tie-break column).

    Two-phase by design: `orderBy().limit(k)` compiles to
    TakeOrderedAndProject (per-partition heap of k + driver merge — no
    global sort, no single-partition window), then the k-row result is
    ranked with a window that is trivially cheap.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(k)
        .withColumn("rnk", F.row_number().over(w))
    )


# Reference predicate preference order (concept_resolver.py:91-99: the
# SPARQL alternation skos:prefLabel|schema:name|rdfs:label|skos:altLabel|
# schema:identifier|skos:notation with LIMIT 1).
LABEL_PREFERENCE = ["prefLabel", "name", "label", "altLabel", "identifier",
                    "notation"]


def multilabel_resolve(
    facts: DataFrame, term_col: str, vocab_labels: DataFrame
) -> DataFrame:
    """J2 multi-predicate term resolution (concept_resolver.py:86-100):
    `vocab_labels` is the unpivoted label dimension (uri, predicate,
    value); a term matching several label predicates resolves through
    the reference's preference order, made deterministic with
    row_number()==1 (the LIMIT 1 analog) tie-broken on uri.

    The rank-and-pick runs on the dimension (small) BEFORE the fact
    join, so the fact side sees one row per term and broadcast-joins —
    per-row SPARQL with lru_cache becomes a map-side hash probe."""
    from pyspark.sql.window import Window

    pref = F.array(*[F.lit(p) for p in LABEL_PREFERENCE])
    w = Window.partitionBy("value").orderBy(
        F.array_position(pref, F.col("predicate")).asc(), F.col("uri")
    )
    best = (
        vocab_labels.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(F.col("value").alias(term_col), "uri",
                F.col("predicate").alias("matched_predicate"))
    )
    return facts.join(F.broadcast(best), term_col, "left")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating salted join: replicate the (small) build side
    once per salt, scatter each probe row to a deterministic salt, and
    join on (key, salt).

    The cure for the classic 100 TB failure mode: a shuffle join on a
    low-cardinality / heavy-hitter key concentrates each hot key in
    ONE reducer task. Salting fans every key out over `n_salts`
    reducers at the cost of replicating the build side ×n_salts —
    correct because each probe row still meets exactly the build rows
    of its own (key, salt) cell. Result ≡ the unsalted join, which is
    what the DuckDB oracle checks. (AQE's skew-join split handles
    moderate skew automatically; explicit salting is the portable fix
    when one key dominates a partition beyond what splitting solves.)
    """
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int")
    )
    return salted_fact.join(
        salted_dim.hint("shuffle_hash"), [key, "_salt"], how
    ).drop("_salt")


def cdc_apply(
    changes: DataFrame,
    key: str,
    order: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a change-data-capture log to produce the current
    snapshot: the lakehouse MERGE / compaction primitive. Each key's
    changes are ordered by the (unique) ``order`` columns; the final
    state is the payload of the last change, keys whose last change is
    a ``delete`` tombstone vanish, and ``n_ops`` records the change
    count that folded into each surviving row.

    Execution: ONE two-phase aggregate on the key — ``max_by`` over
    the order struct picks the latest change with map-side partial
    aggregation (each upstream partition reduces to ≤ one candidate
    per key before the shuffle; Spark compiles the struct ``max_by``
    to a sort-based partial/final aggregate), so a 100 TB change log
    with a hot key never needs a window and never concentrates raw
    changes in one reducer. This is the batch shape of streaming upsert compaction
    (streaming/idempotent_sink.py) and the tombstone-aware variant of
    upsert_by_key above.
    """
    payload = [c for c in changes.columns if c not in (key,)]
    ordk = F.struct(*[F.col(c) for c in order])
    latest = changes.groupBy(key).agg(
        F.max_by(F.struct(*payload), ordk).alias("_last"),
        F.count("*").alias("n_ops"),
    )
    return latest.filter(
        F.col(f"_last.{op_col}") != F.lit(delete_op)
    ).select(key, "_last.*", "n_ops")

"""CSV sources — SURVEY.md §2.1 S1/S2 (csv2rdf.py:54-55).

S1: `;`-delimited archival metadata. S2: DROID tool output — the
reference builds a pandas index on NAME for O(1) lookups; on Spark the
key is just a join column (the broadcast hash join *is* the index).
Schema-on-read with inferSchema for parity with pandas; production
callers pass an explicit DDL (inference is a full extra pass over a
100 TB input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_metadata_csv(spark: SparkSession, path: str,
                      schema: str | None = None) -> DataFrame:
    """S1 (pd.read_csv(path, delimiter=';'), csv2rdf.py:54)."""
    reader = spark.read.option("sep", ";").option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return reader.csv(path)


def read_droid_csv(spark: SparkSession, path: str,
                   schema: str | None = None) -> DataFrame:
    """S2 (pd.read_csv(path, index_col='NAME'), csv2rdf.py:55), with
    the F14 null→0 SIZE cast (csv2rdf.py:56) applied as in the
    reference."""
    reader = spark.read.option("sep", ",").option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    df = reader.csv(path)
    if "SIZE" in df.columns:
        df = df.withColumn("SIZE", F.coalesce(F.col("SIZE").cast("long"), F.lit(0)))
    return df


# ---------------------------------------------------------------------------
# Dialect sniffing — ingestion of CSVs nobody documented
# ---------------------------------------------------------------------------

_CANDIDATE_DELIMS = (",", ";", "|", "\t")


def sniff_csv_dialect(
    sample: bytes, max_lines: int = 20, byte_budget: int = 65536
) -> dict:
    """Detect (delimiter, has_header) of an undocumented CSV from its
    first lines. Real data lakes are full of exports whose dialect
    nobody recorded; Spark's csv reader needs the answer UP FRONT
    (``sep`` is not inferred), so the sniff runs once per file on a
    small prefix and the real distributed read follows.

    Delimiter: each candidate is scored by parsing the sample with a
    quote-aware reader — a candidate survives only if every line
    yields the SAME field count > 1, and the highest consistent field
    count wins (an embedded delimiter inside a quoted field produces
    a consistent-but-lower count for the wrong candidate; ties break
    by the candidate order above). Header: the first row is a header
    iff none of its fields parses as an integer while some field of
    the second row does — the numeric-shift heuristic.

    Deliberately NOT stdlib csv.Sniffer: its regex heuristics guess
    single-column files and quote styles unpredictably; this scoring
    rule is deterministic and documented."""
    import csv
    import io

    # Truncate by BYTE budget, never by splitlines(): a quoted field
    # with an embedded newline would be broken into two records before
    # the quote-aware parser ever sees it, defeating the
    # consistent-field-count rule (ADVICE r9). Records are capped
    # AFTER parsing instead.
    truncated = len(sample) > byte_budget
    text = sample[:byte_budget].decode("utf-8", "replace")

    def _records(delim: str) -> list:
        rows = []
        rdr = csv.reader(io.StringIO(text), delimiter=delim)
        for row in rdr:
            rows.append(row)
            if len(rows) >= max_lines:
                break
        # a byte-budget cut can split the final record mid-quote —
        # discard it rather than let a mangled tail veto a candidate
        if truncated and len(rows) < max_lines and rows:
            rows.pop()
        return rows

    best: tuple[int, int] | None = None  # (field_count, -cand_idx)
    best_delim = ","
    for idx, d in enumerate(_CANDIDATE_DELIMS):
        try:
            rows = _records(d)
        except csv.Error:
            continue
        if not rows:
            continue
        counts = {len(r) for r in rows if r}
        if len(counts) != 1:
            continue
        (n,) = counts
        if n < 2:
            continue
        key = (n, -idx)
        if best is None or key > best:
            best = key
            best_delim = d
    def _is_int(s: str) -> bool:
        try:
            int(s)
            return True
        except ValueError:
            return False

    rows = _records(best_delim)
    has_header = (
        len(rows) >= 2
        and not any(_is_int(f) for f in rows[0])
        and any(_is_int(f) for f in rows[1])
    )
    return {"delimiter": best_delim, "has_header": has_header}

"""Separator-framed records from ONE huge text file — the shared
machinery behind the single-file sources (MBOX spools, Wikipedia XML
dumps): real corpora deliver these as one multi-GB file, and the
per-file task model cannot shard them.

The plan is the classic two-pass parallel prefix scan:
1. ``textFile`` splits the file into line blocks (input splits — a
   100 GB file becomes ~800 tasks at 128 MB),
2. pass 1 counts separator lines per partition (ONE long per
   partition crosses to the driver, prefix-summed, broadcast),
3. pass 2 labels every line with its global record id plus an
   order-preserving (partition << 32 | ordinal) line number —
   partitions are in split-offset order for a text file, so the pair
   sorts lines back into document order,
4. records reassemble in the single shuffle (groupBy record id,
   sort_array inside the aggregation — bounded by RECORD size, never
   file size).

Records straddling split boundaries are exactly what the scan
handles; callers force small splits in tests to prove it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def record_line_expr():
    """The reassembly aggregate shared by the grouped paths: lines of
    one record, sorted by the (partition << 32 | ordinal) key, joined
    with newlines."""
    from pyspark.sql import functions as F

    return F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("line_no", "line"))),
            lambda s: s["line"],
        ),
        "\n",
    )


def separator_records(
    spark,
    path: str,
    is_separator: Callable[[str], bool],
    min_partitions: int | None = None,
    keep_separator: bool = False,
    return_lines: bool = False,
) -> DataFrame:
    """(rec_id long, rec string), one row per separator-introduced
    record, lines re-joined with ``\\n`` in document order. Lines
    before the first separator (a preamble/header) carry rec_id 0 and
    are DROPPED; ``keep_separator`` controls whether the separator
    line itself opens the record text (wiki ``<page>`` lines do, mbox
    ``From `` framing lines do not).

    ``return_lines`` (r12, the Content-Length mbox dialects): return
    the LABELED LINE frame (rec_id, line_no, line, is_sep) instead of
    grouping — callers that must re-map record boundaries (stitching
    falsely-split records) do so at line level and pay the reassembly
    shuffle only once."""
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    lines = (
        sc.textFile(path, min_partitions)
        if min_partitions else sc.textFile(path)
    )

    def _count(idx: int, it):
        n = 0
        for ln in it:
            if is_separator(ln):
                n += 1
        yield idx, n

    counts = dict(lines.mapPartitionsWithIndex(_count).collect())
    offsets: dict[int, int] = {}
    acc = 0
    for i in sorted(counts):
        offsets[i] = acc
        acc += counts[i]
    bc = sc.broadcast(offsets)

    def _label(idx: int, it):
        base = bc.value[idx]
        seen = 0
        for j, ln in enumerate(it):
            sep = is_separator(ln)
            if sep:
                seen += 1
                if not keep_separator:
                    continue
            yield base + seen, (idx << 32) | j, ln, sep

    labeled = spark.createDataFrame(
        lines.mapPartitionsWithIndex(_label),
        "rec_id long, line_no long, line string, is_sep boolean",
    ).filter(F.col("rec_id") > 0)
    if return_lines:
        return labeled
    return (
        labeled.groupBy("rec_id")
        .agg(record_line_expr().alias("rec"))
    )

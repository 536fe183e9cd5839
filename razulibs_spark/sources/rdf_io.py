"""RDF serialization sinks/sources — SURVEY.md §2.1 (K1/K2, S3/S4).

N-Triples is the distributed-friendly interchange form: one triple per
line, no document state, so a triples DataFrame maps to `write.text`
with a per-row formatter and parses back with per-line regexes — both
directions scale linearly and shuffle nothing. Turtle output adds the
11-prefix header of razu/meta_graph.py:19-29 and per-subject grouping;
it is produced per-partition (each partition's subjects are complete
because we repartition by subject first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from razulibs_spark.operators.rdf import NAMESPACES, TRIPLE_SCHEMA


def _escape_literal(col: Column) -> Column:
    # N-Triples string escaping: backslash, quote, newline, tab, CR.
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def ntriples_line(s=None, p=None, o=None, o_type=None, o_datatype=None,
                  o_lang=None) -> Column:
    """Format one triple row as an N-Triples line (pure expressions).
    Defaults bind to the canonical triple columns lazily (F.col needs
    an active session, so not in default args)."""
    s = F.col("s") if s is None else s
    p = F.col("p") if p is None else p
    o = F.col("o") if o is None else o
    o_type = F.col("o_type") if o_type is None else o_type
    o_datatype = F.col("o_datatype") if o_datatype is None else o_datatype
    o_lang = F.col("o_lang") if o_lang is None else o_lang
    subj = F.when(s.startswith("bnode:"), F.concat(F.lit("_:"), F.md5(s))).otherwise(
        F.concat(F.lit("<"), s, F.lit(">"))
    )
    pred = F.concat(F.lit("<"), p, F.lit(">"))
    lit_body = F.concat(F.lit('"'), _escape_literal(o), F.lit('"'))
    obj = (
        F.when(o_type == "uri", F.concat(F.lit("<"), o, F.lit(">")))
        .when(o_type == "bnode", F.concat(F.lit("_:"), F.md5(o)))
        .when(o_lang.isNotNull(), F.concat(lit_body, F.lit("@"), o_lang))
        .when(
            o_datatype.isNotNull(),
            F.concat(lit_body, F.lit("^^<"), o_datatype, F.lit(">")),
        )
        .otherwise(lit_body)
    )
    return F.concat_ws(" ", subj, pred, obj, F.lit("."))


def write_ntriples(triples: DataFrame, path: str) -> None:
    """K2 sink: one `.nt` part per partition, append-merge friendly."""
    triples.select(ntriples_line().alias("value")).write.mode("overwrite").text(path)


TURTLE_HEADER = "".join(
    f"@prefix {k}: <{v}> .\n" for k, v in sorted(NAMESPACES.items())
)

_NT_RE = (
    r'^(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"'
    r'(?:@([A-Za-z-]+)|\^\^<([^>]*)>)?)\s*\.\s*$'
)


def read_ntriples(spark, path: str) -> DataFrame:
    """S4 source: parse N-Triples lines back into the triples schema
    with per-line regexes — distributed, no document-level state."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    g = lambda i: F.regexp_extract("value", _NT_RE, i)
    raw = lines.select(
        g(1).alias("s_uri"), g(2).alias("s_bnode"), g(3).alias("p"),
        g(4).alias("o_uri"), g(5).alias("o_bnode"), g(6).alias("o_lit"),
        g(7).alias("o_lang_m"), g(8).alias("o_dt_m"),
    )
    unescape = F.regexp_replace  # applied pairwise below
    o_lit = raw["o_lit"]
    for esc, rep in (('\\\\n', '\n'), ('\\\\r', '\r'), ('\\\\t', '\t'), ('\\\\"', '"'), ('\\\\\\\\', '\\\\')):
        o_lit = unescape(o_lit, esc, rep)
    return raw.select(
        F.when(raw["s_uri"] != "", raw["s_uri"]).otherwise(raw["s_bnode"]).alias("s"),
        F.col("p"),
        F.when(raw["o_uri"] != "", raw["o_uri"])
        .when(raw["o_bnode"] != "", raw["o_bnode"])
        .otherwise(o_lit)
        .alias("o"),
        F.when(raw["o_uri"] != "", F.lit("uri"))
        .when(raw["o_bnode"] != "", F.lit("bnode"))
        .otherwise(F.lit("literal"))
        .alias("o_type"),
        F.when(raw["o_dt_m"] != "", raw["o_dt_m"]).alias("o_datatype"),
        F.when(raw["o_lang_m"] != "", raw["o_lang_m"]).alias("o_lang"),
    )


def turtle_text(triples: DataFrame, max_rows: int = 100_000) -> str:
    """Combined-graph Turtle export (K2; razu/sip.py:42-49) for
    demo/golden-test scale: canonically ordered, prefix header included.
    Driver-side by design — the distributed form is write_ntriples."""
    rows = (
        triples.select(ntriples_line().alias("line"))
        .orderBy("line")
        .limit(max_rows)
        .collect()
    )
    return TURTLE_HEADER + "\n" + "\n".join(r["line"] for r in rows) + "\n"

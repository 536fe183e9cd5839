"""Sitemap XML source/sink (sitemaps.org protocol, the other half of
crawl discovery next to robots.txt — operators/robots.py extracts the
``Sitemap:`` pointers, this module scans the documents they point at).

Two document kinds share one grammar: ``<urlset>`` files list page
URLs with optional lastmod/changefreq/priority, ``<sitemapindex>``
files list child sitemap URLs. A corpus snapshot of sitemap files is
scanned per-FILE (binaryFile tasks — sitemap files are ≤50k URLs by
spec, so file-level parallelism is the natural unit) and both kinds
land in one records frame tagged by ``kind``; frontier assembly is
then a join/filter, not a recursive fetch (there is no network here —
a real crawler resolves index→child by fetching, which is the
fetcher's job, not the scanner's).

Parsing is strict ElementTree over the spec namespace: a file whose
root is neither urlset nor sitemapindex, or an entry without <loc>,
raises ValueError — an ingest gate, never a silently dropped URL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_NS = "{%s}" % SITEMAP_NS

SITEMAP_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # urlset | index
        StructField("loc", StringType(), False),
        StructField("lastmod", StringType(), True),
        StructField("changefreq", StringType(), True),
        StructField("priority", DoubleType(), True),
    ]
)


def parse_sitemap(content: bytes) -> list[tuple]:
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(content)
    except ET.ParseError as exc:
        raise ValueError(f"sitemap: malformed XML: {exc}") from exc
    if root.tag == _NS + "urlset":
        kind, entry_tag = "urlset", _NS + "url"
    elif root.tag == _NS + "sitemapindex":
        kind, entry_tag = "index", _NS + "sitemap"
    else:
        raise ValueError(f"sitemap: unexpected root {root.tag!r}")
    rows: list[tuple] = []
    for entry in root:
        if entry.tag != entry_tag:
            raise ValueError(
                f"sitemap: expected {entry_tag!r}, got {entry.tag!r}"
            )
        loc = entry.findtext(_NS + "loc")
        if not loc or not loc.strip():
            raise ValueError("sitemap: entry without <loc>")
        pr = entry.findtext(_NS + "priority")
        rows.append(
            (
                kind,
                loc.strip(),
                (entry.findtext(_NS + "lastmod") or "").strip() or None,
                (entry.findtext(_NS + "changefreq") or "").strip() or None,
                float(pr) if pr is not None else None,
            )
        )
    return rows


def read_sitemaps(spark: SparkSession, path: str) -> DataFrame:
    """Sitemap file tree → one records frame (urlset + index rows
    tagged by kind). Per-file tasks."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in it:
            rows: list[tuple] = []
            for content in pdf["content"]:
                b = bytes(content)
                if b.strip():
                    rows.extend(parse_sitemap(b))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("content")
        .mapInPandas(batches, schema=SITEMAP_SCHEMA)
    )


_XML_ILLEGAL_RE = None  # compiled lazily


def _esc(v: str) -> str:
    """Element-text escape + write-time rejection of XML-1.0-illegal
    control characters (same posture as the RDF/XML sinks: a URL with
    a raw control byte cannot be represented in XML at all — fail the
    write, don't emit a document every parser rejects)."""
    import re

    global _XML_ILLEGAL_RE
    if _XML_ILLEGAL_RE is None:
        _XML_ILLEGAL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
    if _XML_ILLEGAL_RE.search(v):
        raise ValueError(
            f"sitemap: XML-1.0-illegal control character in {v!r}"
        )
    # \r as &#13; — XML line-end normalization would silently rewrite
    # a raw CR to LF on parse (the rdfxml-sink lesson, ADVICE r7).
    return (
        v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\r", "&#13;")
    )


def write_urlset_files(
    urls: DataFrame,
    directory: str,
    group_col: str = "host",
    loc_col: str = "loc",
    lastmod_col: str | None = "lastmod",
    priority_col: str | None = "priority",
) -> None:
    """One ``sitemap-<group>.xml`` urlset per group (per host, per
    shard — the spec's 50k-URL cap is the writer's natural split
    unit), written executor-side on a shared FS. Repartition by the
    group column first so one task owns each group's file."""
    import os

    os.makedirs(directory, exist_ok=True)
    cols = [group_col, loc_col]
    if lastmod_col:
        cols.append(lastmod_col)
    if priority_col:
        cols.append(priority_col)

    def write_partition(rows) -> None:
        groups: dict[str, list[str]] = {}
        for row in rows:
            parts = ["  <url><loc>" + _esc(row[loc_col]) + "</loc>"]
            if lastmod_col and row[lastmod_col] is not None:
                parts.append(f"<lastmod>{_esc(row[lastmod_col])}</lastmod>")
            if priority_col and row[priority_col] is not None:
                parts.append(f"<priority>{row[priority_col]:.1f}</priority>")
            parts.append("</url>")
            groups.setdefault(row[group_col], []).append("".join(parts))
        for g, lines in groups.items():
            doc = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                f'<urlset xmlns="{SITEMAP_NS}">\n'
                + "\n".join(lines)
                + "\n</urlset>\n"
            )
            with open(
                os.path.join(directory, f"sitemap-{g}.xml"), "w"
            ) as fh:
                fh.write(doc)

    urls.select(*cols).repartition(group_col).foreachPartition(
        write_partition
    )


def write_sitemap_index(
    entries: list[tuple[str, str | None]], path: str
) -> None:
    """One sitemapindex file from (loc, lastmod) pairs — index files
    are host-level singletons (a handful of entries), written
    driver-side by design."""
    lines = []
    for loc, lastmod in entries:
        row = "  <sitemap><loc>" + _esc(loc) + "</loc>"
        if lastmod:
            row += f"<lastmod>{_esc(lastmod)}</lastmod>"
        lines.append(row + "</sitemap>")
    with open(path, "w") as fh:
        fh.write(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<sitemapindex xmlns="{SITEMAP_NS}">\n'
            + "\n".join(lines)
            + "\n</sitemapindex>\n"
        )

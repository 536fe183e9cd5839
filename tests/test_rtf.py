"""RTF text extraction (operators/rtf.py)."""

from __future__ import annotations

import pytest

from razulibs_spark.operators.rtf import encode_rtf, rtf_to_text


def test_roundtrip_and_destination_drop():
    t = rtf_to_text(encode_rtf(7, "a b c d e f g h i j".split()))
    lines = t.split("\n")
    assert lines[0] == "Doc 7"
    assert lines[1] == "café € and a plus {braced} back\\slash\tend"
    assert lines[2] == "a b c d e f g h"
    assert lines[3] == "i j"
    # destinations never leak
    assert "Times" not in t and "secret" not in t
    assert "razulibs-spark" not in t and "generator" not in t


def test_unicode_fallback_skipping():
    # \uc1: one fallback char swallowed; \uc2: two (incl. \'hh forms)
    assert rtf_to_text(rb"{\rtf1\uc1 x\u8364?y}") == "x€y"
    assert rtf_to_text(rb"{\rtf1\uc2 x\u8364??y}") == "x€y"
    assert rtf_to_text(rb"{\rtf1\uc2 x\u8364\'3f\'3fy}") == "x€y"
    # negative 16-bit form
    assert rtf_to_text(rb"{\rtf1\uc0 \u-3812}") == chr(65536 - 3812)
    # \uc is GROUP-scoped: inner \uc2 must not leak out
    assert (
        rtf_to_text(rb"{\rtf1\uc1 {\uc2 \u8364??}\u8364?x}") == "€€x"
    )


def test_control_symbols_and_bin():
    assert rtf_to_text(rb"{\rtf1 a\{b\}c\\d}") == "a{b}c\\d"
    assert rtf_to_text(rb"{\rtf1 a\~b}") == "a b"
    # \bin skips raw bytes exactly (even braces inside)
    assert rtf_to_text(rb"{\rtf1 a\bin4 }}{{b}") == "ab"
    with pytest.raises(ValueError, match="bin overruns"):
        rtf_to_text(rb"{\rtf1 \bin999 xy}")


def test_fallback_consumes_control_symbols():
    # fallback counting includes CONTROL SYMBOLS (\\~ \\- \\_): each is
    # consumed as one fallback char, so the character AFTER it stays
    # (ADVICE r10: suppress-without-decrement swallowed the wrong
    # following character)
    assert rtf_to_text(rb"{\rtf1\uc1 x\u8364\~y}") == "x\u20acy"
    assert rtf_to_text(rb"{\rtf1\uc1 x\u8364\-y}") == "x\u20acy"
    assert rtf_to_text(rb"{\rtf1\uc2 x\u8364\~\_y}") == "x\u20acy"


def test_codepage_bytes():
    assert rtf_to_text(rb"{\rtf1\ansicpg1252 caf\'e9}") == "café"
    assert rtf_to_text(rb"{\rtf1\ansicpg1251 \'e4\'ee\'ec}") == "дом"
    # double-byte codepages are now SUPPORTED, not rejected
    assert rtf_to_text(rb"{\rtf1\ansicpg932 x}") == "x"


def test_structural_strictness():
    with pytest.raises(ValueError, match="not an RTF document"):
        rtf_to_text(b"plain text")
    with pytest.raises(ValueError, match="unclosed"):
        rtf_to_text(rb"{\rtf1 {x")
    with pytest.raises(ValueError, match="unbalanced"):
        rtf_to_text(rb"{\rtf1 x}}")


def test_rtf_stage_fail_closed(spark):
    from razulibs_spark.operators.rtf import (
        rtf_text_stats,
        synthesize_rtf_media,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (17, "poisoned")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r
            for r in rtf_text_stats(synthesize_rtf_media(docs)).collect()}
    assert rows[0]["parsed"] is True and rows[0]["n_lines"] == 3
    assert rows[17]["parsed"] is False
    assert "not an RTF document" in rows[17]["note"]


def test_double_byte_codepages():
    """cp932/936/949/950: lead/trail pairs decode whether the trail
    arrives as a second \\'hh or as a raw ASCII char; half-width
    katakana stay single bytes; a dangling lead fails closed."""
    t = rtf_to_text(
        rb"{\rtf1\ansicpg932 \'93\'fa\'96\'7b\'8c\'ea\'83e\'83\'4c\'83\'58\'83g}"
    )
    assert t == "日本語テキスト"  # 日本語テキスト
    assert rtf_to_text(rb"{\rtf1\ansicpg932 \'b1}") == "ｱ"  # ｱ
    assert rtf_to_text(rb"{\rtf1\ansicpg936 \'d6\'d0\'b9\'fa}") == "中国"
    assert rtf_to_text(rb"{\rtf1\ansicpg949 \'c7\'d1}") == "한"
    assert rtf_to_text(rb"{\rtf1\ansicpg950 \'a4\'a4}") == "中"
    with pytest.raises(ValueError, match="without a trail byte"):
        rtf_to_text(rb"{\rtf1\ansicpg932 \'93}")
    with pytest.raises(ValueError, match="unsupported codepage"):
        rtf_to_text(rb"{\rtf1\ansicpg54321 x}")


def test_cp932_fixture_roundtrip():
    from razulibs_spark.operators.rtf import encode_rtf

    t = rtf_to_text(encode_rtf(9, ["alpha", "beta"], cp932=True))
    first_two = t.split("\n")[:2]
    assert first_two[0] == "Doc 9"
    assert first_two[1].startswith(
        "日本語テキスト € and alpha"
    )


def test_foreign_producer_invariance():
    from razulibs_spark.operators.rtf import encode_rtf_foreign

    words = "alpha beta gamma delta eps zeta eta theta iota".split(" ")
    assert rtf_to_text(encode_rtf_foreign(5, words)) == rtf_to_text(
        encode_rtf(5, words)
    )


def test_dbcs_escaped_trail_bytes():
    """0x5C/0x7B/0x7D are valid cp932 trail bytes and are legally
    written as the two-byte escapes \\\\ \\{ \\} after a \\'hh lead —
    accept them as the trail instead of rejecting valid CJK docs
    (ADVICE r11)."""
    # cp932: 0x935C=貼 0x937B=怒 0x937D=党
    assert rtf_to_text(rb"{\rtf1\ansicpg932 \'93\\}") == "貼"
    assert rtf_to_text(rb"{\rtf1\ansicpg932 \'93\{}") == "怒"
    assert rtf_to_text(rb"{\rtf1\ansicpg932 \'93\}}") == "党"
    # a lead followed by a NON-trail escape still fails closed
    with pytest.raises(ValueError, match="without a trail byte"):
        rtf_to_text(rb"{\rtf1\ansicpg932 \'93\par x}")

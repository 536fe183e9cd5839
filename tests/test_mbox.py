"""MBOX sharded source — separator framing, mboxrd quoting, split
boundaries."""

from __future__ import annotations

from razulibs_spark.operators.mbox import mbox_escape, mbox_unescape


def test_mboxrd_quoting_roundtrip():
    body = (
        "From the start\n>From quoted already\n>>From deeper\n"
        "not From here\nFrom \n"
    )
    esc = mbox_escape(body)
    # every ^>*From line gained exactly one '>'
    assert esc.splitlines()[0] == ">From the start"
    assert esc.splitlines()[1] == ">>From quoted already"
    assert esc.splitlines()[3] == "not From here"
    assert mbox_unescape(esc) == body


def test_sharded_mbox_across_splits(spark, tmp_path):
    from razulibs_spark.operators.eml import encode_eml, parse_eml
    from razulibs_spark.operators.mbox import (
        _FROM_LINE,
        read_mbox_sharded,
    )

    words = "alpha beta gamma delta eps zeta eta theta".split(" ")
    msgs = {d: encode_eml(d, words).decode() for d in range(40)}
    mbox = "\n".join(
        _FROM_LINE + "\n" + mbox_escape(m) for m in msgs.values()
    )
    p = tmp_path / "spool.mbox"
    p.write_text(mbox)
    out = read_mbox_sharded(spark, str(p), min_partitions=8).collect()
    assert len(out) == 40
    subjects = set()
    for r in out:
        m = parse_eml(r["raw"].encode())
        subjects.add(m["subject"])
    assert subjects == {
        parse_eml(msgs[d].encode())["subject"] for d in range(40)
    }

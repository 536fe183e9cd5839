"""robots.txt evaluation (operators/robots.py, RFC 9309 subset)."""

from __future__ import annotations

from razulibs_spark.operators.robots import RobotsMatcher, parse_robots


def test_parse_groups_and_agent_precedence():
    txt = """# comment
User-agent: googlebot
Disallow: /g

User-agent: *
Disallow: /all
Allow: /all/ok
Crawl-delay: 10
"""
    assert parse_robots(txt, "googlebot") == [(False, "/g")]
    assert parse_robots(txt, "*") == [(False, "/all"), (True, "/all/ok")]
    # unknown agent falls back to the * group; a specific group
    # REPLACES it (rfc 9309 2.2.1), never merges
    assert parse_robots(txt, "otherbot") == [
        (False, "/all"), (True, "/all/ok")
    ]
    # stacked user-agent lines share one group
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(multi, "b") == [(False, "/x")]
    # empty disallow = no rule
    assert parse_robots("User-agent: *\nDisallow:\n") == []


def test_matcher_specificity_wildcards_and_anchors():
    m = RobotsMatcher(
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/open\n"
        "Disallow: /tmp*\n"
        "Disallow: /*.pdf$\n"
    )
    assert m.allowed("/pub/x")
    assert not m.allowed("/private/secret")
    # longest pattern wins regardless of rule order
    assert m.allowed("/private/open/doc")
    # wildcard prefix
    assert not m.allowed("/tmpfiles/a") and not m.allowed("/tmp/a")
    # $ anchors the END: .pdf mid-path stays allowed
    assert not m.allowed("/files/x.pdf")
    assert m.allowed("/files/x.pdf.html")
    # allow wins an exact-length tie
    tie = RobotsMatcher(
        "User-agent: *\nDisallow: /a/b\nAllow: /a/*\n"
    )
    assert tie.allowed("/a/b")  # both patterns length 4 -> allow
    # no rules / missing robots: everything allowed
    assert RobotsMatcher("").allowed("/anything")


def test_robots_filter_stage(spark):
    from razulibs_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        [(1, "a.example", "/private/x"), (2, "a.example", "/pub"),
         (3, "b.example", "/private/x")],
        "doc_id long, host string, path string",
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_filter(urls, robots).collect()}
    # b.example has NO robots file -> allowed (null txt tolerated)
    assert got == {1: False, 2: True, 3: True}

"""URL canonicalization — pure Column expressions, no UDF.

Training-data pipelines dedup crawls by canonical URL before any
content hashing: scheme/host case, default ports, duplicate path
slashes, tracking parameters, query-parameter order, and fragments
all vary across recrawls of the same resource. Canonicalizing first
collapses those recrawls into one key, so the (cheap) URL-level dedup
removes the bulk before the (expensive) content-level MinHash pass
(operators/dedup.py) runs.

Everything here is built-in expressions (regexp_extract / filter /
array_sort / concat) — JVM-side, whole-stage-codegen'd, map-only: the
canonical key is computed in the scan stage and the only shuffle in a
URL-dedup is the final groupBy on the canonical key.

Canonical form produced by :func:`canonical_url`:

- scheme and host lowercased; a leading ``www.`` stripped
- default ports dropped (``:443`` for https, ``:80`` for http);
  non-default ports kept
- runs of ``/`` in the path collapsed; empty path becomes ``/``
- query parameters: tracking params (``utm_*``) and empties dropped,
  the rest sorted bytewise and re-joined; an empty result drops the
  ``?`` entirely
- the fragment is dropped

The regexes use only syntax common to Java regex (Spark) and RE2
(DuckDB), so the DuckDB oracle in queries.py mirrors them verbatim.

Scope: http(s) crawl URLs — the hostname parse does not special-case
userinfo (``user:pass@host``) or bracketed IPv6 authorities; crawl
pipelines reject those upstream (and credentialed URLs should never
reach a training corpus). Extend ``url_host``/``url_port`` if a
corpus legitimately carries them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(url, _SCHEME_RE, "")


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped."""
    authority = F.regexp_extract(_after_scheme(url), r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port digits, '' when absent."""
    authority = F.regexp_extract(_after_scheme(url), r"^([^/?#]*)", 1)
    return F.regexp_extract(authority, r":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    """Path with duplicate slashes collapsed; '/' when empty."""
    raw = F.regexp_extract(_after_scheme(url), r"^[^/?#]*([^?#]*)", 1)
    collapsed = F.regexp_replace(raw, r"/{2,}", "/")
    return F.when(collapsed == "", F.lit("/")).otherwise(collapsed)


def url_query_canonical(url: Column) -> Column:
    """Query string with utm_* and empty params dropped and the rest
    sorted bytewise — '' when nothing survives."""
    # the query starts at the first '?' BEFORE any '#' — a '?' inside
    # the fragment is not a query (caught by the hypothesis test)
    raw = F.regexp_extract(_after_scheme(url), r"^[^?#]*\?([^#]*)", 1)
    params = F.filter(
        F.split(raw, "&"),
        lambda p: (~p.startswith("utm_")) & (p != ""),
    )
    return F.array_join(F.array_sort(params), "&")


def canonical_url(url: Column) -> Column:
    """Full canonical form (see module docstring). Pure expression —
    compose it into the scan projection; no Python crossing."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
    )
    query = url_query_canonical(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path(url),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def registrable_domain(host: Column, suffixes: list[str]) -> Column:
    """eTLD+1 (the "registrable domain") of a hostname against a
    public-suffix list — the key URL blocklists, per-site crawl caps
    (curate_source_cap) and cookie policies actually operate on:
    ``news.bbc.co.uk`` must collapse to ``bbc.co.uk``, not ``co.uk``
    (two sites) and not ``bbc.co.uk``'s subdomain forest (one site
    split into millions of keys).

    Algorithm (publicsuffix.org, plain-rules subset — wildcard and
    exception rules are out of scope and documented): the public
    suffix is the LONGEST list entry that suffix-matches the host on
    label boundaries; the registrable domain is that suffix plus one
    label. A host with no match falls back to its last label as the
    suffix (the PSL's implicit ``*`` rule); a host that IS a public
    suffix has no registrable domain (NULL).

    Scale shape: the suffix list is a static artifact (~10k entries
    for the real PSL), inlined as a LITERAL array — the expression is
    pure whole-stage codegen, map-only, zero shuffle, zero Python:
    candidate suffixes via transform/slice over the host's labels,
    longest match = first hit in longest→shortest candidate order."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    cands = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    lit_sfx = F.array(*[F.lit(s) for s in suffixes])
    matched = F.filter(
        cands, lambda c: F.array_contains(lit_sfx, c)
    )
    # candidates run longest→shortest; try_: no match → NULL (the
    # implicit-* fallback below), not an ANSI index error
    pub = F.try_element_at(matched, F.lit(1))
    k = F.coalesce(F.size(F.split(pub, r"\.")), F.lit(1))
    return F.when(
        n > k, F.array_join(F.slice(labels, n - k, k + 1), ".")
    )

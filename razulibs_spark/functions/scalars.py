"""Scalar column builders — SURVEY.md §2.8 (F1–F22), Spark-first.

Each builder reproduces the semantics of a reference scalar function
as a *pure Catalyst expression* (JVM-side, whole-stage-codegen
friendly) — no Python UDFs on the hot path. Reference citations give
the behavior contract; the implementation is idiomatic Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1 — date_type(str): classify a date string and normalize it.
# Reference: razu/util.py:9-30 — regex classify `yyyy-mm-dd` → xsd:date,
# `yyyy` → xsd:gYear, `d-m-yyyy` → reformat to ISO xsd:date, else plain.
# ---------------------------------------------------------------------------

ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
GYEAR_RE = r"^\d{4}$"
DMY_RE = r"^\d{1,2}-\d{1,2}-\d{4}$"


def date_type_classify(col: Column) -> tuple[Column, Column]:
    """Return (xsd_type, normalized_value) columns for a date string.

    xsd_type ∈ {'xsd:date','xsd:gYear','literal'}; normalized_value is
    the ISO yyyy-mm-dd form for date-typed values (d-m-yyyy gets
    reordered and zero-padded, mirroring razu/util.py:21-27), the raw
    string otherwise.
    """
    dmy_iso = F.concat_ws(
        "-",
        F.split_part(col, F.lit("-"), F.lit(3)),
        F.lpad(F.split_part(col, F.lit("-"), F.lit(2)), 2, "0"),
        F.lpad(F.split_part(col, F.lit("-"), F.lit(1)), 2, "0"),
    )
    xsd_type = (
        F.when(col.rlike(ISO_DATE_RE), F.lit("xsd:date"))
        .when(col.rlike(GYEAR_RE), F.lit("xsd:gYear"))
        .when(col.rlike(DMY_RE), F.lit("xsd:date"))
        .otherwise(F.lit("literal"))
    )
    value = (
        F.when(col.rlike(ISO_DATE_RE), col)
        .when(col.rlike(DMY_RE), dmy_iso)
        .otherwise(col)
    )
    return xsd_type, value


# ---------------------------------------------------------------------------
# F2 / F5 — multi-part extension and stem.
# Reference: razu/util.py:32-53 (repeated splitext → `.tar.gz`),
# razu/util.py:109-126 (cut at first dot).
# ---------------------------------------------------------------------------


def full_extension(name: Column) -> Column:
    """Everything from the first dot on (`a.tar.gz` → `.tar.gz`), '' if none."""
    return F.when(
        name.rlike(r"^[^.]*\."), F.regexp_extract(name, r"^[^.]*(\..*)$", 1)
    ).otherwise(F.lit(""))


def filename_stem(name: Column) -> Column:
    """Filename up to the first dot (razu/util.py:109-126)."""
    return F.split_part(name, F.lit("."), F.lit(1))


def mtime_iso(ts: Column) -> Column:
    """F3 — file mtime → ISO-8601 string (razu/manifest.py:262 via
    razu/util.py: datetime.fromtimestamp(...).isoformat()). Always
    emits 6 fractional digits (the reference's isoformat drops a zero
    micros field; a fixed width keeps the column sortable and
    engine-portable)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


# ---------------------------------------------------------------------------
# F6 — normalize_path. Reference: razu/util.py:128-153 — backslash→slash,
# relativize to a base dir or to the `bestanden/` segment.
# ---------------------------------------------------------------------------


def normalize_path(path: Column, anchor: str = "bestanden/") -> Column:
    fwd = F.regexp_replace(path, r"\\", "/")
    return F.when(
        fwd.contains(anchor), F.substring_index(fwd, anchor, -1)
    ).otherwise(fwd)


# ---------------------------------------------------------------------------
# F8 — uid / uri / filename / S3-key templating.
# Reference: razu/identifiers.py:11-86 — `{razu_file_id}-{creator}-
# {archive}-{id}`, CDN uri, and `millions/thousands` zero-padded S3
# path bucketing (identifiers.py:80-86).
# ---------------------------------------------------------------------------


def razu_uid(object_id: Column, file_id: str = "NL-WbDRAZU", creator: str = "G0321", archive: str = "661") -> Column:
    return F.concat_ws("-", F.lit(file_id), F.lit(creator), F.lit(archive), object_id.cast("string"))


def razu_uri(uid: Column, base: str = "https://data.razu.nl", segment: str = "id", kind: str = "object") -> Column:
    return F.concat_ws("/", F.lit(base), F.lit(segment), F.lit(kind), uid)


def razu_filename(uid: Column, suffix: str = "meta", ext: str = "json") -> Column:
    return F.concat(uid, F.lit("."), F.lit(suffix), F.lit("."), F.lit(ext))


def razu_s3_key(object_id: Column, uid: Column) -> Column:
    """`{millions:03d}/{thousands:03d}/{uid}` bucketing (identifiers.py:80-86).

    Integer div/mod keeps one S3 prefix under ~1000 objects — the same
    trick that keeps parquet output directories balanced at scale.
    """
    millions = F.lpad(F.floor(object_id / 1_000_000).cast("long").cast("string"), 3, "0")
    thousands = F.lpad(
        F.floor((object_id % 1_000_000) / 1_000).cast("long").cast("string"), 3, "0"
    )
    return F.concat_ws("/", millions, thousands, uid)


# ---------------------------------------------------------------------------
# F10/F11/F12 — coordinate parsing and WKT polygon.
# Reference: demo/csv_luchtfotos/extra.py:14-18 (parse `"X 136669000 Y
# 451994996"` → (x/1000, y/1000)), extra.py:29-40 (two corners →
# POLYGON WKT). The pyproj EPSG transform (extra.py:23-25) is the one
# genuinely-Python scalar; it lives in operators/multimodal-style
# pandas UDF territory and is not needed for the oracle surface.
# ---------------------------------------------------------------------------


def parse_rd_coord(col: Column) -> tuple[Column, Column]:
    x = (F.split_part(col, F.lit(" "), F.lit(2)).cast("double") / 1000.0)
    y = (F.split_part(col, F.lit(" "), F.lit(4)).cast("double") / 1000.0)
    return x, y


def wkt_bbox_polygon(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    def pt(a: Column, b: Column) -> Column:
        return F.concat_ws(" ", a.cast("string"), b.cast("string"))

    return F.concat(
        F.lit("POLYGON (("),
        F.concat_ws(", ", pt(x1, y1), pt(x2, y1), pt(x2, y2), pt(x1, y2), pt(x1, y1)),
        F.lit("))"),
    )


# ---------------------------------------------------------------------------
# Cross-engine-deterministic aggregation helper.
#
# Double sums are accumulation-order dependent, so a Spark parallel sum
# and a DuckDB sequential sum can differ in the last ulps. Worse,
# Spark's double→decimal cast rounds the *shortest string repr* of the
# double (BigDecimal.valueOf) while DuckDB rounds the binary value —
# they disagree on exact-half ties. The portable fix is fixed-point:
# per row compute floor(x·10^s + 0.5) — three IEEE-deterministic ops —
# sum the resulting integers exactly, and divide once at the end. The
# final double is bit-identical in both engines as long as the integer
# sum stays below 2^53 (10^4-scaled money at 100 TB needs the
# per-group sums < ~9·10^14, which the grouped queries satisfy; global
# sums would use scale 2).
# ---------------------------------------------------------------------------


def dec_sum(col: Column, alias: str, scale: int = 4) -> Column:
    m = 10 ** scale
    return (
        F.sum(F.floor(col * m + F.lit(0.5)).cast("long")) / float(m)
    ).alias(alias)


def DEC_SUM_SQL(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB spelling of :func:`dec_sum` for oracle queries."""
    m = 10 ** scale
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {m}.0 AS {alias}"
    )


# ---------------------------------------------------------------------------
# F10 — RD (EPSG:28992) → WGS84 (EPSG:4326) coordinate transform.
# Reference: demo/csv_luchtfotos/extra.py:10,23-25 wraps pyproj per
# row. Here the transform is the published Schreutelkamp & Strang van
# Hees approximation polynomials (±1 m, "Benaderingsformules voor de
# transformatie tussen RD- en WGS84-kaartcoördinaten", Geodesia 2001)
# as pure Column expressions — JVM whole-stage codegen, no Python
# boundary, no pyproj dependency. For survey-grade accuracy swap in a
# pyproj pandas_udf; the call signature is identical.
# ---------------------------------------------------------------------------

_RD_X0, _RD_Y0 = 155_000.0, 463_000.0
_PHI0, _LAM0 = 52.15517440, 5.38720621

_K_COEFFS = [  # (p, q, K_pq) for latitude seconds
    (0, 1, 3235.65389), (2, 0, -32.58297), (0, 2, -0.24750),
    (2, 1, -0.84978), (0, 3, -0.06550), (2, 2, -0.01709),
    (1, 0, -0.00738), (4, 0, 0.00530), (2, 3, -0.00039),
    (4, 1, 0.00033), (1, 1, -0.00012),
]
_L_COEFFS = [  # (p, q, L_pq) for longitude seconds
    (1, 0, 5260.52916), (1, 1, 105.94684), (1, 2, 2.45656),
    (3, 0, -0.81885), (1, 3, 0.05594), (3, 1, -0.05607),
    (0, 1, 0.01199), (3, 2, -0.00256), (1, 4, 0.00128),
    (0, 2, 0.00022), (2, 0, -0.00022), (5, 0, 0.00026),
]


def rd_to_wgs84(x: Column, y: Column) -> tuple[Column, Column]:
    """(RD x, RD y) metres → (lat, lon) WGS84 degrees (F10)."""
    dx = (x - F.lit(_RD_X0)) * 1e-5
    dy = (y - F.lit(_RD_Y0)) * 1e-5

    def poly(coeffs):
        total = F.lit(0.0)
        for p, q, c in coeffs:
            total = total + F.lit(c) * F.pow(dx, F.lit(p)) * F.pow(dy, F.lit(q))
        return total

    lat = F.lit(_PHI0) + poly(_K_COEFFS) / 3600.0
    lon = F.lit(_LAM0) + poly(_L_COEFFS) / 3600.0
    return lat, lon


def luhn_valid(col: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digit string — the
    validity gate that separates a CREDIT CARD NUMBER from sixteen
    arbitrary digits (an order id, a tracking code): a PII scrubber
    that redacts on the bare \\d{16} pattern destroys harmless
    identifiers, one that skips validation leaks real PANs. Pure
    codegen: aggregate over the digit positions, doubling every
    second digit from the right (minus 9 past 9), valid iff the sum
    is ≡ 0 (mod 10). Zero Python, rides the scan projection."""
    n = F.length(col)
    digit = lambda i: F.substring(col, n - i + 1, 1).cast("int")  # noqa: E731

    def term(acc: Column, i: Column) -> Column:
        d = digit(i)
        dd = d * 2
        return acc + F.when(i % 2 == 1, d).otherwise(
            F.when(dd > 9, dd - 9).otherwise(dd)
        )

    return F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term) % 10 == 0

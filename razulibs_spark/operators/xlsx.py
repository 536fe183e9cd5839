"""XLSX (SpreadsheetML) tabular extraction — the 14th file format:
open-data portals, government statistics and enterprise exports ship
tables as .xlsx far more often than CSV, and a training-data pipeline
that cannot read them loses exactly the structured half of its corpus.
No openpyxl in this container and none needed for the VALUE layer: an
.xlsx is an OPC zip (same container discipline as operators/docx.py)
whose workbook part names its sheets, whose sheet parts hold sparse
``<row>``/``<c>`` grids, and whose strings live in a SHARED table the
cells index into.

The value-extraction traps this parser covers (each planted in the
fixture corpus):
- shared strings (``t="s"``) resolve through xl/sharedStrings.xml,
  including RICH-TEXT entries (``<si><r><t>…`` runs concatenate — the
  classic naive-parser bug that drops every formatted cell),
- inline strings (``t="inlineStr"``),
- booleans (``t="b"``: 0/1 → FALSE/TRUE),
- cached formula results (``t="str"`` with ``<f>``: the cached
  ``<v>`` is the value, the formula text is NOT),
- sparse grids (missing cells/columns are absent, not empty — cell
  REFERENCES, not positions, carry the geometry),
- numbers kept as their lexical ``<v>`` text (no float round-trip —
  the value layer is exact).

Sheet resolution follows the OPC relationship walk (workbook rels →
sheet part), not hardcoded part names — same posture as the DOCX
main-part resolution. Structural corruption (missing sheet part,
unresolvable shared-string index) raises ValueError naming the
defect; the Spark stage is fail-closed per row.

Scale: one Arrow ``mapInPandas`` pass over (doc_id, payload) rows,
stateless, linear — the media-family shape.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from xml.etree import ElementTree as ET

_SS_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_DOC_REL_NS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)


def _s(tag: str) -> str:
    return f"{{{_SS_NS}}}{tag}"


def _si_text(si: ET.Element) -> str:
    """One <si> shared-string entry → text: either a bare <t> or a
    sequence of rich <r><t> runs (concatenated — formatting is
    transparent to the value layer)."""
    t = si.find(_s("t"))
    if t is not None:
        return t.text or ""
    return "".join(
        (r.findtext(_s("t")) or "") for r in si.findall(_s("r"))
    )


def parse_xlsx(payload: bytes) -> dict:
    """First sheet of one workbook → {'sheet_name', 'n_rows',
    'n_cells', 'cells': list of (ref, value_str) in document order}."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"xlsx: not an OPC package: {exc}") from exc
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("xlsx: no workbook part")
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find(_s("sheets"))
    if sheets is None or len(sheets) == 0:
        raise ValueError("xlsx: workbook names no sheets")
    first = sheets[0]
    sheet_name = first.get("name", "")
    rid = first.get(f"{{{_DOC_REL_NS}}}id")
    if rid is None:
        raise ValueError("xlsx: sheet without relationship id")
    # OPC walk: workbook rels resolve rId → part (never hardcode
    # worksheets/sheet1.xml — foreign producers number parts freely)
    rels_name = "xl/_rels/workbook.xml.rels"
    if rels_name not in names:
        raise ValueError("xlsx: workbook has no relationships part")
    rels = ET.fromstring(zf.read(rels_name))
    target = None
    for rel in rels.findall(f"{{{_REL_NS}}}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target")
            break
    if target is None:
        raise ValueError(f"xlsx: relationship {rid} not found")
    # OPC target resolution (ECMA-376 pt.2 §9.2): a leading '/' is a
    # package-absolute part name; anything else resolves relative to
    # the SOURCE part's directory (xl/ for workbook.xml.rels), with
    # ../ segments normalized — foreign producers emit both forms.
    if target.startswith("/"):
        part = target.lstrip("/")
    else:
        part = posixpath.normpath(posixpath.join("xl", target))
    if part not in names:
        raise ValueError(f"xlsx: sheet part {part} missing in package")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_si_text(si) for si in sst.findall(_s("si"))]

    sheet = ET.fromstring(zf.read(part))
    data = sheet.find(_s("sheetData"))
    cells: list[tuple[str, str]] = []
    n_rows = 0
    for row in (data if data is not None else []):
        n_rows += 1
        for c in row.findall(_s("c")):
            ref = c.get("r", "")
            typ = c.get("t", "n")
            if typ == "inlineStr":
                is_el = c.find(_s("is"))
                val = _si_text(is_el) if is_el is not None else ""
            else:
                v = c.findtext(_s("v"))
                if v is None:
                    continue  # formula without cached value, or blank
                if typ == "s":
                    idx = int(v)
                    if idx >= len(shared):
                        raise ValueError(
                            f"xlsx: shared string {idx} out of range "
                            f"({len(shared)} entries)"
                        )
                    val = shared[idx]
                elif typ == "b":
                    val = "TRUE" if v.strip() == "1" else "FALSE"
                else:  # n (number) / str (cached formula): lexical
                    val = v
            cells.append((ref, val))
    return {
        "sheet_name": sheet_name,
        "n_rows": n_rows,
        "n_cells": len(cells),
        "cells": cells,
    }


# ---------------------------------------------------------------------------
# Writer (fixture producer — independent implementation: template
# strings, while the parser walks ElementTree)
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheetA.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'sharedStrings+xml"/></Types>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_REL_NS}">'
    '<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheetA.xml"/>'
    '<Relationship Id="rId8" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/sharedStrings" '
    'Target="sharedStrings.xml"/></Relationships>'
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_SS_NS}" xmlns:r="{_DOC_REL_NS}">'
    '<sheets><sheet name="Data" sheetId="1" r:id="rId7"/></sheets>'
    "</workbook>"
)


def encode_xlsx(d: int, words: list[str], poison: bool = False) -> bytes:
    """One real workbook from doc d: a header row of SHARED strings
    (one rich-text entry with two runs), three data rows mixing raw
    numbers, INLINE strings, booleans and a cached-formula string —
    with column D populated only in the header and C/E only in data
    rows (the sparse grid). ``poison``: the workbook rels point at a
    sheet part that is not in the package. Sheet part is named
    sheetA.xml on purpose — readers that hardcode sheet1.xml never
    find it."""
    shared = [
        "<si><t>id</t></si>",
        "<si><t>word</t></si>",
        # rich-text entry: two runs, concatenates to "w-<d>"
        f"<si><r><t>w-</t></r><r><t>{d}</t></r></si>",
    ]
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_SS_NS}" count="3" uniqueCount="3">'
        + "".join(shared) + "</sst>"
    )
    rows = [
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        '<c r="D1" t="s"><v>2</v></c>'
        "</row>"
    ]
    for i in range(3):
        rn = i + 2
        w = _esc(words[i % len(words)]) if words else ""
        rows.append(
            f'<row r="{rn}">'
            f'<c r="A{rn}"><v>{d * 10 + i}</v></c>'
            f'<c r="B{rn}" t="inlineStr"><is><t>{w}</t></is></c>'
            f'<c r="C{rn}" t="b"><v>{(d + i) % 2}</v></c>'
            f'<c r="E{rn}" t="str"><f>CONCAT("f",{d + i})</f>'
            f"<v>f{d + i}</v></c>"
            "</row>"
        )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_SS_NS}"><sheetData>'
        + "".join(rows) + "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        stamp = (1980, 1, 1, 0, 0, 0)

        def add(name: str, data: str) -> None:
            zi = zipfile.ZipInfo(name, date_time=stamp)
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)

        add("[Content_Types].xml", _CONTENT_TYPES)
        add("_rels/.rels", _ROOT_RELS)
        add("xl/workbook.xml", _WORKBOOK)
        add("xl/_rels/workbook.xml.rels", _WB_RELS)
        add("xl/sharedStrings.xml", sst)
        if not poison:
            add("xl/worksheets/sheetA.xml", sheet)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_XLSX_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

XLSX_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("parsed", BooleanType(), False),
        StructField("sheet_name", StringType(), True),
        StructField("n_rows", LongType(), True),
        StructField("n_cells", LongType(), True),
        StructField("cell_digest", StringType(), True),
        StructField("note", StringType(), True),
    ]
)


def synthesize_xlsx_media(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload) real workbooks; d%29 == 21 is
    the poison slot (sheet part missing from the package)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (
                    int(doc_id),
                    encode_xlsx(
                        int(doc_id),
                        str(text).split(" "),
                        poison=(int(doc_id) % 29 == 21),
                    ),
                )
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema=_XLSX_MEDIA_SCHEMA
    )


def xlsx_stats(media: DataFrame) -> DataFrame:
    """Parse each payload for real; fail-closed per row. The digest is
    order-exact over ``ref=value`` pairs in document order — a wrong
    shared-string resolution, a dropped rich run, a bool emitted as
    0/1 or a formula string leaking its formula all flip it."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in XLSX_STATS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                try:
                    m = parse_xlsx(bytes(payload))
                except (ValueError, ET.ParseError) as exc:
                    rows.append(
                        (d, False, None, None, None, None, str(exc))
                    )
                    continue
                digest = hashlib.md5(
                    "\x01".join(
                        f"{ref}={val}" for ref, val in m["cells"]
                    ).encode("utf-8")
                ).hexdigest()
                rows.append(
                    (
                        d, True, m["sheet_name"], m["n_rows"],
                        m["n_cells"], digest, None,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, schema=XLSX_STATS_SCHEMA)

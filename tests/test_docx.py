"""DOCX parser semantics — run transparency, xml:space, tabs/breaks,
table flattening, OPC main-part resolution, fail-closed posture."""

from __future__ import annotations

import io
import zipfile

import pytest

from razulibs_spark.operators.docx import (
    _CONTENT_TYPES_XML,
    _OFFICE_DOC_TYPE,
    _REL_NS,
    _W_NS,
    encode_docx,
    parse_docx_text,
)


def test_roundtrip_with_table_and_torture():
    words = [f"w{i}" for i in range(20)]
    doc = encode_docx(10, words)  # d%5==0 -> table
    paras = parse_docx_text(doc)["paragraphs"]
    assert paras[0] == 'AT&T <tag>\t"padded" #10'
    assert paras[1] == " ".join(words[:8])
    assert paras[2] == " ".join(words[8:16])
    assert paras[3] == " ".join(words[16:20])
    assert paras[4:] == ["cell A10", "cell B10"]


def test_no_table_when_not_fifth():
    paras = parse_docx_text(encode_docx(3, ["a", "b"]))["paragraphs"]
    assert paras == ['AT&T <tag>\t"padded" #3', "a b"]


def test_poison_missing_main_part():
    with pytest.raises(ValueError, match="main part .* missing"):
        parse_docx_text(encode_docx(7, ["x"], poison=True))


def test_not_a_zip():
    with pytest.raises(ValueError, match="not a zip"):
        parse_docx_text(b"PK\x03\x04 but truncated garbage")


def _package(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _rels(target: str) -> str:
    return (
        f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_OFFICE_DOC_TYPE}" '
        f'Target="{target}"/></Relationships>'
    )


def test_renamed_main_part_resolves_via_rels():
    """A main part NOT named word/document.xml must resolve through
    _rels/.rels (renamed parts are legal OPC)."""
    xml = (
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        '<w:p><w:r><w:t>hello</w:t></w:r></w:p>'
        "</w:body></w:document>"
    )
    pkg = _package(
        {
            "[Content_Types].xml": _CONTENT_TYPES_XML,
            "_rels/.rels": _rels("/custom/main.xml"),  # leading slash too
            "custom/main.xml": xml,
        }
    )
    assert parse_docx_text(pkg)["paragraphs"] == ["hello"]


def test_space_semantics_and_breaks():
    xml = (
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        "<w:p>"
        "<w:r><w:t>  stripped  </w:t></w:r>"
        '<w:r><w:t xml:space="preserve">  kept  </w:t></w:r>'
        "<w:r><w:br/></w:r>"
        "<w:r><w:t>after</w:t></w:r>"
        "</w:p></w:body></w:document>"
    )
    pkg = _package(
        {"_rels/.rels": _rels("word/document.xml"),
         "word/document.xml": xml}
    )
    assert parse_docx_text(pkg)["paragraphs"] == [
        "stripped  kept  \nafter"
    ]


def test_missing_rels_and_missing_relationship():
    with pytest.raises(ValueError, match="no _rels"):
        parse_docx_text(_package({"word/document.xml": "<x/>"}))
    with pytest.raises(ValueError, match="no officeDocument"):
        parse_docx_text(
            _package(
                {"_rels/.rels": f'<Relationships xmlns="{_REL_NS}"/>'}
            )
        )

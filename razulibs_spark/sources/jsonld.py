"""JSON-LD sink/source and multi-format RDF scan — SURVEY.md §2.1
(K1: per-entity JSON-LD sink, razu/meta_resource.py:45-54; S3: JSON-LD
scan, razu/meta_resource.py:56-61; S4: multi-format RDF scan,
razu/turtle.py:6-32).

Representation: *flat* JSON-LD — one document per entity, holding an
`@graph` array of node objects (the entity node plus the blank nodes
it owns). Blank nodes stay skolemized (`bnode:<uid>:<local>`,
operators/rdf.py) and are carried verbatim in `@id`; skolemization is
the W3C-sanctioned way to give blank nodes stable IRIs, and it is what
lets two documents merge with a plain union instead of the reference's
bnode-suffix remap (tools/collect_rdf.py:37-54).

Scale shape: the sink is JSON-Lines — one complete JSON-LD document
per line — not one file per entity (the reference's per-entity
`open()`/`write()` at meta_resource.py:45-54 is the single-node
pattern; a 100 TB corpus wants few large files, and any consumer can
still address one entity = one line). Document (de)serialization is
the one genuinely row-shaped job in the engine (SURVEY §2.11), so it
runs as Arrow-batched applyInPandas / mapInPandas — never
row-at-a-time Python UDFs.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from razulibs_spark.operators.rdf import NAMESPACES, TRIPLE_SCHEMA


def owning_entity(subject: Column) -> Column:
    """Default document-grouping key: a skolemized bnode
    `bnode:<uid>:<local>` belongs to the entity `<uid>`; a URI subject
    `.../<uid>` is keyed by its last path segment (the razu_uri
    convention, functions/scalars.py). Callers with other URI layouts
    pass their own `owner` column."""
    return F.when(
        subject.startswith("bnode:"),
        F.regexp_extract(subject, r"^bnode:(.+):[^:]+$", 1),
    ).otherwise(F.regexp_extract(subject, r"([^/]+)$", 1))


def _value_object(row) -> object:
    if row.o_type in ("uri", "bnode"):
        return {"@id": row.o}
    if row.o_lang:
        return {"@value": row.o, "@language": row.o_lang}
    if row.o_datatype:
        return {"@value": row.o, "@type": row.o_datatype}
    return {"@value": row.o}


def _doc_json(nodes: dict) -> str:
    """Nodes dict → one flat JSON-LD document string. Deterministic:
    nodes ordered by @id, predicates sorted, objects in first-seen
    order (callers wanting canonical output sort upstream)."""
    graph = [
        {k: node[k] for k in ["@id"] + sorted(k for k in node if k != "@id")}
        for _, node in sorted(nodes.items())
    ]
    doc = {"@context": dict(sorted(NAMESPACES.items())), "@graph": graph}
    return json.dumps(doc, ensure_ascii=False)


def _docs_from_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Owner-contiguous (sorted) triple rows → one row per document."""
    entities, docs = [], []
    cur, nodes = None, {}
    for own, row in zip(pdf["_owner"].values, pdf.itertuples(index=False)):
        if own != cur:
            if cur is not None:
                entities.append(cur)
                docs.append(_doc_json(nodes))
            cur, nodes = own, {}
        node = nodes.setdefault(row.s, {"@id": row.s})
        node.setdefault(row.p, []).append(_value_object(row))
    if cur is not None:
        entities.append(cur)
        docs.append(_doc_json(nodes))
    return pd.DataFrame({"entity": entities, "jsonld": docs})


def jsonld_docs(triples: DataFrame, owner: Column | None = None) -> DataFrame:
    """(entity, jsonld) — one flat JSON-LD document string per entity.

    Scale shape: a groupBy(owner).applyInPandas would create one
    pandas frame per entity — at corpus scale that is millions of
    tiny groups and the per-group overhead IS the runtime (measured
    24.6 s → ~3 s at sf0.1, 150k entities). Instead the triples are
    hash-partitioned on the owning entity (one shuffle, same as the
    grouped form) and sorted within partitions, and a single
    streaming mapInPandas pass emits a document every time the owner
    changes; rows of the trailing owner are carried over to the next
    Arrow batch so groups that straddle batch boundaries stay intact.
    Entities are assumed document-sized (≤ thousands of triples), as
    in the reference — one entity always fits one buffer."""
    owner = owning_entity(F.col("s")) if owner is None else owner
    t = triples.withColumn("_owner", owner)
    # Width: the owner-hash shuffle happens regardless; one bucket per
    # core is the right width for the CPU-bound doc-build loop — a
    # single-split source must not serialize it through one task, and
    # an explicit numPartitions repartition is NOT AQE-coalesced, so
    # tying it to shuffle.partitions would schedule mostly-empty
    # Python-worker tasks on small inputs. mapInPandas streams Arrow
    # batches, so per-partition size does not bound worker memory.
    n = triples.sparkSession.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            last = pdf["_owner"].iloc[-1]
            tail = pdf["_owner"].values == last
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield _docs_from_sorted(head)
        if carry is not None and len(carry):
            yield _docs_from_sorted(carry)

    # Sort on the FULL row (not just _owner,s,p): duplicate (s,p) with
    # several objects would otherwise leave the emitted object-list
    # order up to shuffle arrival — the docstring's determinism claim
    # requires the value columns in the sort key too (ADVICE r5).
    return (
        t.repartition(n, "_owner")
        .sortWithinPartitions(
            "_owner", "s", "p", "o", "o_type", "o_datatype", "o_lang"
        )
        .mapInPandas(gen, schema="entity string, jsonld string")
    )


def write_jsonld(triples: DataFrame, path: str, owner: Column | None = None) -> None:
    """K1 sink: JSON-Lines of per-entity JSON-LD documents."""
    jsonld_docs(triples, owner).select("jsonld").write.mode("overwrite").text(path)


def _parse_lines(values) -> tuple[dict, list[int]]:
    """Parse an iterable of JSON-LD document lines into flat triple
    columns, returning (columns, per-line triple counts). The counts
    let callers attach per-line metadata (entity_id) with one
    np.repeat instead of re-invoking the parser per row."""
    out = {k: [] for k in ("s", "p", "o", "o_type", "o_datatype", "o_lang")}
    counts: list[int] = []
    for line in values:
        before = len(out["s"])
        doc = json.loads(line)
        for node in doc.get("@graph", [doc]):
            s = node["@id"]
            for p, vals in node.items():
                if p.startswith("@"):
                    continue
                if not isinstance(vals, list):
                    vals = [vals]
                for v in vals:
                    if not isinstance(v, dict):
                        v = {"@value": v}
                    if "@id" in v:
                        o, o_type = v["@id"], (
                            "bnode" if v["@id"].startswith("bnode:") else "uri"
                        )
                        dt = lang = None
                    else:
                        o, o_type = str(v["@value"]), "literal"
                        dt, lang = v.get("@type"), v.get("@language")
                    out["s"].append(s)
                    out["p"].append(p)
                    out["o"].append(o)
                    out["o_type"].append(o_type)
                    out["o_datatype"].append(dt)
                    out["o_lang"].append(lang)
        counts.append(len(out["s"]) - before)
    return out, counts


def _parse_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out, _ = _parse_lines(pdf["value"])
        yield pd.DataFrame(out)


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """S3 source: JSON-LD documents (one per line) → triples DataFrame.
    Line-framed, so the parse distributes per input split with no
    document-level coordination."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    return lines.mapInPandas(_parse_docs, schema=TRIPLE_SCHEMA)


def read_rdf(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """S4 multi-format RDF scan (razu/turtle.py:6-32 tries
    turtle/xml/n3/nt/trig/nquads/json-ld/trix until one parses; here
    the extension decides, with an explicit override —
    content-sniffing a 100 TB input is not a plan, a schema is).

    All eight reference formats dispatch: the line-framed five
    (jsonld/nt/ttl/n3/nq) parse per input split; the document-framed
    three (rdfxml/trig/trix — sources/rdfxml.py) parse per file.
    Graph labels of quad formats (nquads/trig/trix) are dropped here —
    S4's contract is a triples frame; use the readers directly for the
    quad shape."""
    from razulibs_spark.sources.rdf_io import (
        read_nquads, read_ntriples, read_turtle,
    )
    from razulibs_spark.sources.rdfxml import read_rdfxml, read_trig, read_trix

    if fmt is None:
        low = path.lower().rstrip("/")
        if low.endswith((".jsonld", ".json")):
            fmt = "jsonld"
        elif low.endswith((".nt", ".ntriples")):
            fmt = "ntriples"
        elif low.endswith((".ttl", ".turtle", ".n3")):
            fmt = "turtle"
        elif low.endswith((".nq", ".nquads")):
            fmt = "nquads"
        elif low.endswith((".rdf", ".rdfxml", ".owl", ".xml")):
            fmt = "rdfxml"
        elif low.endswith(".trig"):
            fmt = "trig"
        elif low.endswith(".trix"):
            fmt = "trix"
        else:
            raise ValueError(
                f"cannot infer RDF format from {path!r}; pass fmt="
            )
    if fmt == "jsonld":
        return read_jsonld(spark, path)
    if fmt == "ntriples":
        return read_ntriples(spark, path)
    if fmt in ("turtle", "n3"):
        return read_turtle(spark, path)
    if fmt == "nquads":
        return read_nquads(spark, path).drop("g")
    if fmt in ("rdfxml", "xml"):
        return read_rdfxml(spark, path)
    if fmt == "trig":
        return read_trig(spark, path).drop("g")
    if fmt == "trix":
        return read_trix(spark, path).drop("g")
    raise ValueError(f"unsupported RDF format {fmt!r}")


def write_jsonld_per_entity(triples: DataFrame, directory: str,
                            suffix: str = ".meta.json",
                            owner: Column | None = None,
                            distributed: bool = False) -> int:
    """The reference's exact one-file-per-entity layout
    (meta_resource.py:45-54: `{uid}.meta.json`). Returns the number
    of files written.

    Default path is driver-side (collect + sequential writes) —
    demo/SIP scale only; the scalable line-oriented sink is
    write_jsonld (JSON-Lines). ``distributed=True`` writes from the
    executors via foreachPartition instead (VERDICT r5 item 8) —
    correct when ``directory`` is on a SHARED filesystem every
    executor mounts (NFS/FUSE-mounted object store); same byte
    layout, no driver I/O loop, parallelism = the doc builder's
    partitioning. The docs frame is persisted so the count action
    does not rebuild the documents after the write action."""
    import os

    os.makedirs(directory, exist_ok=True)
    docs = jsonld_docs(triples, owner)
    if not distributed:
        rows = docs.collect()
        for row in rows:
            with open(
                os.path.join(directory, row["entity"] + suffix), "w"
            ) as fh:
                fh.write(row["jsonld"] + "\n")
        return len(rows)

    def write_partition(rows) -> None:
        for row in rows:
            with open(
                os.path.join(directory, row["entity"] + suffix), "w"
            ) as fh:
                fh.write(row["jsonld"] + "\n")

    docs = docs.persist()
    try:
        docs.foreachPartition(write_partition)
        return docs.count()
    finally:
        docs.unpersist()


def scan_sip_dir(spark: SparkSession, directory: str,
                 suffix: str = ".meta.json") -> DataFrame:
    """S5 directory scan → resource set (razu/sip.py:186-196):
    glob `*.meta.json`, extract the entity id from the filename with
    input_file_name + regexp_extract, parse each document to triples.
    Returns triples plus an `entity_id` column."""
    lines = (
        spark.read.text(os.path.join(directory, "*" + suffix))
        .withColumn(
            "entity_id",
            F.regexp_extract(
                F.input_file_name(), r"([^/]+)" + suffix.replace(".", r"\.") + "$", 1
            ),
        )
        .filter(F.length(F.trim("value")) > 0)
    )
    parsed_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in TRIPLE_SCHEMA.fields
    ) + ", entity_id string"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One _parse_lines call per Arrow batch (not per row): the
        # per-line triple counts fan the batch's entity_id column out
        # over the parsed rows with a single np.repeat — same
        # tiny-group fix as jsonld_docs (SCALE.md r5; VERDICT r5 #3).
        import numpy as np

        for pdf in batches:
            out, counts = _parse_lines(pdf["value"])
            out["entity_id"] = np.repeat(
                pdf["entity_id"].to_numpy(), counts
            )
            yield pd.DataFrame(out)

    return lines.mapInPandas(parse, schema=parsed_schema)

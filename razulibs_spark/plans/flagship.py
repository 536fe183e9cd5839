"""Flagship end-to-end pipeline — the Spark shape of the reference's
csv2rdf lifecycle (SURVEY.md §3.1, csv2rdf.py:23-261).

scan → derive scalar columns → broadcast-join dimensions → grouped +
global aggregation → entity projection → fan-out to RDF triples.

One lazy plan, no per-row I/O: the reference's per-row SPARQL lookups
(concept_resolver.py:102-114) are one broadcast join; its per-entity
file writes (meta_resource.py:45-54) become one distributed sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from razulibs_spark import tables
from razulibs_spark.functions.scalars import razu_uid, razu_uri
from razulibs_spark.operators.rdf import PropertyMap, entity_to_triples, graph_union


def flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive/serie/record entity trees as one triples DataFrame.

    Mirrors csv2rdf.main(): `part` plays the metadata table, `lineitem`
    the droid tool output (J1 lookup), `nation` the vocabulary
    dimension (J2 resolve), brand groups play the series (A6), and the
    global date range forms the archive singleton (A1/A7).
    """
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    nation = tables.load(spark, sf_dir, "nation")

    # J1: fact ⋈ broadcast(dim) lookup — droid_df.loc[...] re-expressed.
    enriched = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).join(
        F.broadcast(nation),
        (li.l_suppkey % 25).cast("int") == nation.n_nationkey,
    )

    # A6: per-serie (brand) rollup — order-independent group semantics.
    series = enriched.groupBy("p_brand").agg(
        F.count("*").alias("n_members"),
        F.min("l_shipdate").alias("earliest"),
        F.max("l_shipdate").alias("latest"),
    )
    serie_uid = razu_uid(F.regexp_replace(F.col("p_brand"), "#", "-"))
    serie_triples = entity_to_triples(
        series,
        razu_uri(serie_uid),
        [
            PropertyMap("rdf:type", F.lit("ldto:Serie"), "uri"),
            PropertyMap("ldto:naam", F.col("p_brand")),
            PropertyMap(
                "ldto:omvang", F.col("n_members"), datatype="xsd:integer"
            ),
            PropertyMap(
                "ldto:dekkingInTijdBegin",
                F.col("earliest").cast("date"),
                datatype="xsd:date",
            ),
            PropertyMap(
                "ldto:dekkingInTijdEind",
                F.col("latest").cast("date"),
                datatype="xsd:date",
            ),
        ],
    )

    # A1/A7: archive singleton with the global date range.
    archive = li.agg(
        F.min("l_shipdate").alias("earliest"),
        F.max("l_shipdate").alias("latest"),
        F.count("*").alias("n_items"),
    )
    archive_triples = entity_to_triples(
        archive,
        razu_uri(razu_uid(F.lit("archief"))),
        [
            PropertyMap("rdf:type", F.lit("ldto:Archief"), "uri"),
            PropertyMap("ldto:naam", F.lit("spark-graft flagship archive")),
            PropertyMap(
                "ldto:dekkingInTijdBegin",
                F.col("earliest").cast("date"),
                datatype="xsd:date",
            ),
            PropertyMap(
                "ldto:dekkingInTijdEind",
                F.col("latest").cast("date"),
                datatype="xsd:date",
            ),
            PropertyMap("ldto:omvang", F.col("n_items"), datatype="xsd:integer"),
        ],
    )

    return graph_union(serie_triples, archive_triples)

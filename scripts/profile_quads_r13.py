"""Phase profile for the trig/trix/rdfxml roundtrips (guide §1.4):
time the write (real sink), the read alone (noop), and read+compact
(noop) separately so the optimization targets the right side.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from razulibs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("R13_RUNS", "2"))


def t(label, fn):
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{best:8.3f}  {label}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import razulibs_spark.queries as Q
    from razulibs_spark.queries import _quads_for_roundtrip, _compact_quads, _o2_triples_full
    from razulibs_spark.sources.rdfxml import (
        read_trig, write_trig, read_trix, write_trix, read_rdfxml, write_rdfxml,
    )
    from razulibs_spark.operators.rdf import compact_triples, expand_triples

    spark = get_spark("r13-quad-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    quads = _quads_for_roundtrip(spark, SF_DIR)
    triples = expand_triples(_o2_triples_full(spark, SF_DIR))

    sc.setJobDescription("quads source alone")
    t("quads source (noop)", lambda: noop(quads))
    sc.setJobDescription("trig write")
    t("write_trig", lambda: write_trig(quads, "/root/repo/.scratch/prof_trig"))
    sc.setJobDescription("trig read")
    t("read_trig (noop)", lambda: noop(read_trig(spark, "/root/repo/.scratch/prof_trig")))
    sc.setJobDescription("trig read+compact")
    t("read_trig+compact (noop)", lambda: noop(_compact_quads(read_trig(spark, "/root/repo/.scratch/prof_trig"))))

    sc.setJobDescription("trix write")
    t("write_trix", lambda: write_trix(quads, "/root/repo/.scratch/prof_trix"))
    sc.setJobDescription("trix read")
    t("read_trix (noop)", lambda: noop(read_trix(spark, "/root/repo/.scratch/prof_trix")))

    sc.setJobDescription("rdfxml write")
    t("write_rdfxml", lambda: write_rdfxml(triples, "/root/repo/.scratch/prof_rdfxml"))
    sc.setJobDescription("rdfxml read")
    t("read_rdfxml (noop)", lambda: noop(read_rdfxml(spark, "/root/repo/.scratch/prof_rdfxml")))
    sc.setJobDescription("rdfxml read+compact")
    t("read_rdfxml+compact (noop)", lambda: noop(compact_triples(read_rdfxml(spark, "/root/repo/.scratch/prof_rdfxml")).select("s", "p", "o")))

    spark.stop()


if __name__ == "__main__":
    main()

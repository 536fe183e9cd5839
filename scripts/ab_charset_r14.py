"""VERDICT r13 next #1: adjudicate text_charset_sniff — same-session
interleaved A/B of the item-9 widen (on = current code, off = identity
monkeypatch), plus a phase profile of the synthesize → decode →
extract chain. Noop sink, labeled jobs, caches cleared between runs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from razulibs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import razulibs_spark.operators.html as H
    import razulibs_spark.queries as Q
    from razulibs_spark.tables import load

    spark = get_spark("r14-ab-charset")
    spark.sparkContext.setLogLevel("ERROR")
    real_widen = H.widen_python_stage

    def run(tag: str) -> float:
        spark.sparkContext.setJobDescription(f"charset:{tag}")
        t0 = time.time()
        Q.QUERIES["text_charset_sniff"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    # warm the Arrow worker pool once (bench.py does the same)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _warm(s: "pd.Series") -> "pd.Series":
        return s

    _warm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(10_000).select(
        F.pandas_udf(_warm, "long")("id").alias("x")
    ).write.format("noop").mode("overwrite").save()

    print("== interleaved A/B (widen on vs off), 4 rounds ==", flush=True)
    for i in range(4):
        H.widen_python_stage = real_widen
        a = run(f"on{i}")
        H.widen_python_stage = lambda df: df
        b = run(f"off{i}")
        print(f"round {i}: widen_on {a:6.3f}s   widen_off {b:6.3f}s",
              flush=True)
    H.widen_python_stage = real_widen

    print("== phase profile (widen on) ==", flush=True)
    docs = load(spark, SF_DIR, "documents")
    for tag, frame in (
        ("synthesize", H.synthesize_encoded_pages(docs)),
        ("synth+decode", H.decode_pages(H.synthesize_encoded_pages(docs))),
        ("full", Q.QUERIES["text_charset_sniff"](spark, SF_DIR)),
    ):
        best = float("inf")
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"charset-phase:{tag}")
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        print(f"{best:8.3f}  {tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

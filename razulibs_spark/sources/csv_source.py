"""CSV sources — SURVEY.md §2.1 S1/S2 (csv2rdf.py:54-55).

S1: `;`-delimited archival metadata. S2: DROID tool output — the
reference builds a pandas index on NAME for O(1) lookups; on Spark the
key is just a join column (the broadcast hash join *is* the index).
Schema-on-read with inferSchema for parity with pandas; production
callers pass an explicit DDL (inference is a full extra pass over a
100 TB input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_metadata_csv(spark: SparkSession, path: str,
                      schema: str | None = None) -> DataFrame:
    """S1 (pd.read_csv(path, delimiter=';'), csv2rdf.py:54)."""
    reader = spark.read.option("sep", ";").option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return reader.csv(path)


def read_droid_csv(spark: SparkSession, path: str,
                   schema: str | None = None) -> DataFrame:
    """S2 (pd.read_csv(path, index_col='NAME'), csv2rdf.py:55), with
    the F14 null→0 SIZE cast (csv2rdf.py:56) applied as in the
    reference."""
    reader = spark.read.option("sep", ",").option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    df = reader.csv(path)
    if "SIZE" in df.columns:
        df = df.withColumn("SIZE", F.coalesce(F.col("SIZE").cast("long"), F.lit(0)))
    return df

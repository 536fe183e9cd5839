"""ANSI-SQL facade: register the engine tables as temp views and run
raw SQL through Spark SQL.

The DataFrame operators are the engine's primary surface, but every
table is also queryable as plain SQL — and because the oracle
contract already forces engine-portable SQL (fixed-point sums, no
dialect-specific functions), the SAME query text that runs on Spark
here runs verbatim on DuckDB as its own oracle
(`sql_adhoc_region_revenue` in queries.py is literally that: one SQL
string serving as both the Spark query and the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from razulibs_spark import tables


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> None:
    """Register every engine table as a temp view (optionally
    prefixed), making the corpus queryable via ``spark.sql``."""
    for name in tables.TABLES:
        tables.load(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the tables and run one ANSI-SQL query text."""
    register_tables(spark, sf_dir)
    return spark.sql(query)

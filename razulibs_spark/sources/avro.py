"""Avro source/sink — lake-interchange IO beyond the reference's
formats (reference IO is CSV/JSON-LD/RDF, razu/turtle.py:6-32 +
razu/manifest.py:164-183); Avro is included because a 100 TB pipeline
meets it at its borders, and it is the splittable row-major
counterpart to parquet/ORC for write-heavy hand-offs.

Spark ships Avro support as the external ``spark-avro`` module, so the
SHORT format name ``"avro"`` only resolves when that module's
DataSourceRegister service file is on the classpath — this container's
pyspark wheel does not register it and there is no network to fetch
the jar. The implementation CLASS, however,
(``org.apache.spark.sql.avro.AvroFileFormat``) ships inside
spark-sql_2.13-4.1.2.jar itself here, and Spark's DataSource lookup
accepts a fully-qualified class name wherever it accepts a short one.
The helpers therefore probe the classloader and use the FQCN — a real,
tested Avro path in this container, identical bytes to the short-name
path on clusters that do register the module (same class). If a
distribution lacks the class entirely, calls fail with the exact
one-jar fix:

  spark-submit --packages <avro_package_coordinate()>
  or .config("spark.jars.packages", <coordinate>) at session build
  or drop the jar into $SPARK_HOME/jars of the cluster image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_AVRO_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


def avro_package_coordinate() -> str:
    """Exact artifact for this PySpark build: Spark 4.x is Scala
    2.13-only and the module version must match the running Spark."""
    import pyspark

    return f"org.apache.spark:spark-avro_2.13:{pyspark.__version__}"


def avro_available(spark: SparkSession) -> bool:
    """True when the Avro FileFormat class is loadable in the
    session's JVM. A classloader probe, not a trial read — no side
    effects, safe to call per session."""
    try:
        spark._jvm.java.lang.Class.forName(_AVRO_CLASS)  # noqa: SLF001
        return True
    except Exception:
        return False


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise RuntimeError(
            f"Avro FileFormat class {_AVRO_CLASS} is not on this "
            "session's classpath. Enable it with "
            f"--packages {avro_package_coordinate()} or "
            f'.config("spark.jars.packages", "{avro_package_coordinate()}") '
            "at session build time, or add the spark-avro jar to "
            "$SPARK_HOME/jars of the cluster image."
        )


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    """Avro scan. Avro is a splittable container (sync-marker framed
    blocks), so a directory of .avro files distributes the same way
    parquet does; schema comes from the file headers and
    hive-partition directories prune as usual. Options pass through
    (e.g. avroSchema for reader-schema evolution)."""
    _require_avro(spark)
    return spark.read.format(_AVRO_CLASS).options(**options).load(path)


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None, **options,
) -> None:
    """Avro sink; options pass through (e.g. compression='snappy',
    the Spark default)."""
    _require_avro(df.sparkSession)
    w = df.write.format(_AVRO_CLASS).options(**options).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)

"""Avro environment contract (sources/avro.py): the helpers probe the
classpath honestly, the failure names the exact one-jar fix, and the
roundtrip runs whenever the module IS present (skipped otherwise —
this container has no network to fetch it)."""

from __future__ import annotations

import pytest

from razulibs_spark.sources.avro import (
    avro_available,
    avro_package_coordinate,
    read_avro,
    write_avro,
)


def test_coordinate_tracks_running_spark():
    import pyspark

    coord = avro_package_coordinate()
    assert coord == f"org.apache.spark:spark-avro_2.13:{pyspark.__version__}"


def test_gap_error_names_the_fix(spark, tmp_path):
    if avro_available(spark):
        pytest.skip("spark-avro present — the gap error path is dead here")
    with pytest.raises(RuntimeError) as ei:
        read_avro(spark, str(tmp_path / "x.avro"))
    msg = str(ei.value)
    assert avro_package_coordinate() in msg
    assert "--packages" in msg and "spark.jars.packages" in msg
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="spark-avro"):
        write_avro(df, str(tmp_path / "y.avro"))


def test_avro_roundtrip_when_class_present(spark, tmp_path):
    if not avro_available(spark):
        pytest.skip(
            "Avro FileFormat class not on classpath (no network in "
            f"this container); enable with --packages "
            f"{avro_package_coordinate()}"
        )
    import datetime

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (2, 'b"\n\t', 2.5, datetime.datetime(2025, 6, 7, 8, 9, 10)),
            (3, None, None, None),
        ],
        "id long, s string, v double, ts timestamp_ntz",
    )
    path = str(tmp_path / "rt.avro")
    write_avro(df, path, partition_by=["id"])
    got = read_avro(spark, path).select("id", "s", "v", "ts")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, df.collect())
    )

"""Mirror of the driver's t2 correctness gate: every registered query
with an oracle must match DuckDB on row count, column set, and values
(order-insensitive, exact) at the test scale factor.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from razulibs_spark import queries as Q
from razulibs_spark.tables import TABLES

ORACLE_NAMES = sorted(Q.ORACLES)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_frames_match(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame, name: str):
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: column mismatch {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} vs {len(duck_pd)}"
    )
    s = normalize(spark_pd)
    d = normalize(duck_pd)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sv = sv.astype(float)
            dv = dv.astype(float)
            bad = ~((sv == dv) | (sv.isna() & dv.isna()))
        else:
            bad = ~((sv == dv) | (sv.isna() & dv.isna()))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c!r} differs at sorted row {i}: "
                f"spark={sv[i]!r} duckdb={dv[i]!r} ({int(bad.sum())} rows differ)"
            )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    sdf = Q.QUERIES[name](spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    ddf = con.execute(Q.ORACLES[name]).df()
    con.close()
    assert_frames_match(sdf, ddf, name)


def test_every_query_has_callable():
    for name, fn in Q.QUERIES.items():
        assert callable(fn), name

"""Shared fixtures: one SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Spark's python workers (fresh interpreters) must be able to import
# both the package and the test modules that define closures shipped
# to executors (e.g. user reducers in test_custom_state).
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (
        _REPO,
        os.path.join(_REPO, "tests"),
        os.environ.get("PYTHONPATH", ""),
    ) if p
)

from ts_data_pipeline_spark import io  # noqa: E402
from ts_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ts-data-pipeline-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the synthetic tables as views."""
    con = duckdb.connect()
    for t in io.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{io.table_path(SF_DIR, t)}'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Emulate the driver's compare: sort columns by name, then rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def assert_parity(spark_df, oracle_con, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )

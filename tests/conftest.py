"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with fixture views registered, and the compare helper that
mirrors the driver's check (row-count + schema + order-insensitive
values, columns sorted by name)."""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.session import get_spark
from big_data_share_market_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdsm-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{SF_DIR}/{name}.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm_cell(v):
    """Canonicalize a cell to (type-class, value) the way the driver's
    type-aware value hasher sees it: integer WIDTHS are interchangeable
    (int8..int64 all arrive as Python int), but int vs float vs Decimal
    vs bool are DISTINCT classes — ``Decimal(5) == 5`` must NOT pass,
    because DuckDB's HUGEINT (decimal128) output hashes differently
    from Spark's int64 (the r4 driver-failure class)."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        if v == 0.0:
            return ("float", 0.0)  # normalize -0.0
        return ("float", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    return v


def normalize_rows(cols, rows):
    """Sort columns by name, normalize cells, sort rows — the driver's
    order-insensitive compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=repr)


def assert_parity(spark_df, ddb_con, sql, name=""):
    sp_cols = spark_df.columns
    sp_rows = [tuple(r) for r in spark_df.collect()]
    res = ddb_con.execute(sql)
    db_cols = [d[0] for d in res.description]
    db_rows = res.fetchall()
    assert sorted(sp_cols) == sorted(db_cols), (
        f"{name}: column mismatch spark={sorted(sp_cols)} duckdb={sorted(db_cols)}")
    assert len(sp_rows) == len(db_rows), (
        f"{name}: row count spark={len(sp_rows)} duckdb={len(db_rows)}")
    _, sp_norm = normalize_rows(sp_cols, sp_rows)
    _, db_norm = normalize_rows(db_cols, db_rows)
    mismatches = [(a, b) for a, b in zip(sp_norm, db_norm) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(sp_norm)} rows differ; first: "
        f"spark={mismatches[0][0]} duckdb={mismatches[0][1]}")

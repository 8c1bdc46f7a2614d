"""Oracle parity: every registry query with an oracle is executed on
Spark and DuckDB over the same fixture dir and compared exactly the way
the driver does (row count + column set + order-insensitive values).
"""

from __future__ import annotations

import pytest

from big_data_share_market_spark.registry import all_queries

from .conftest import SF_DIR, assert_parity

_QUERIES = all_queries()
_WITH_ORACLE = sorted(name for name, (_, sql) in _QUERIES.items() if sql)
_ROWS_ONLY = sorted(name for name, (_, sql) in _QUERIES.items() if not sql)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, ddb, name):
    fn, sql = _QUERIES[name]
    df = fn(spark, SF_DIR)
    assert_parity(df, ddb, sql, name=name)


# As of r9 every registry query carries an oracle, so this
# parametrize list is EMPTY and pytest reports the placeholder as
# "1 skipped" — expected; the test stays for any future rows-only
# registration.
@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    fn, _ = _QUERIES[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0

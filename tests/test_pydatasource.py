"""Unit tests for the custom Python data source (no Spark needed for
split planning / generator determinism; the full read path is
oracle-verified by test_parity.py::python_datasource_ticks)."""

from __future__ import annotations

import duckdb

from big_data_share_market_spark.sources.pydatasource import (
    _N_PER_SYMBOL, _h60, _tick, make_tick_datasource)


def _reader(options):
    ds_cls = make_tick_datasource()
    return ds_cls(options).reader(None)


def test_partition_planning_splits_by_symbol_and_range():
    r = _reader({"symbols": "A,B", "n_per_symbol": "10",
                 "rows_per_split": "4"})
    parts = r.partitions()
    # ceil(10/4) = 3 ranges per symbol.
    assert [(p.symbol, p.lo, p.hi) for p in parts] == [
        ("A", 0, 4), ("A", 4, 8), ("A", 8, 10),
        ("B", 0, 4), ("B", 4, 8), ("B", 8, 10)]
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 20
    # Every (symbol, seq) exactly once, regardless of split size.
    assert len({(s, q) for s, q, *_ in rows}) == 20


def test_default_reader_covers_full_range():
    r = _reader({})
    parts = r.partitions()
    assert sum(p.hi - p.lo for p in parts) == 4 * _N_PER_SYMBOL


def test_hash_matches_duckdb_md5():
    # The generator's 60-bit hash must equal DuckDB's, or the oracle
    # SQL regenerates a different table.
    con = duckdb.connect()
    for key in ["AAPL:0", "TSLA:255", "x:y:z"]:
        (db,) = con.execute(
            "SELECT CAST(('0x' || substring(md5(?), 1, 15)) AS BIGINT)",
            [key]).fetchone()
        assert _h60(key) == db, key
    con.close()


def test_tick_is_deterministic():
    import datetime as dt
    start = dt.datetime(2024, 1, 1, 9, 30)
    t1 = _tick("AAPL", 7, start, 60)
    t2 = _tick("AAPL", 7, start, 60)
    assert t1 == t2
    assert t1[2] == start + dt.timedelta(seconds=420)

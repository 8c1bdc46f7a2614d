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


def test_tick_fn_twin_matches_tick():
    """_tick_fn is the ship-by-value twin of _tick (driver-side
    streaming source planner lacks addPyFile modules). Divergence was
    previously caught only by the slower oracle parity suite (r10
    ADVICE); pin the twins equal in the fast unit tier."""
    import datetime as dt

    from big_data_share_market_spark.sources.pydatasource import _tick_fn
    twin = _tick_fn()
    start = dt.datetime(2024, 1, 1, 9, 30)
    for sym, seq in [("AAPL", 0), ("TSLA", 255), ("GOOG", 7),
                     ("x:y", 1023)]:
        assert twin(sym, seq, start, 60) == _tick(sym, seq, start, 60)


def _stream_reader(options):
    from big_data_share_market_spark.sources.pydatasource import (
        make_tick_stream_datasource)
    ds_cls = make_tick_stream_datasource()
    return ds_cls(options).streamReader(None)


def test_stream_reader_cursor_never_regresses_after_restart(tmp_path):
    """A RESTARTED reader (fresh process, existing checkpoint) must
    not plan a range below the committed offset. Drives the offset
    lifecycle directly: run 1 commits up to seq 192 via progress_path;
    run 2's reader must resume its cursor there, and a planner-fed
    range is clamped non-negative."""
    progress = str(tmp_path / "progress")
    r1 = _stream_reader({"progress_path": progress, "batch_seqs": "64",
                         "n_per_symbol": "256"})
    assert r1.initialOffset() == {"seq": 0}
    for expect in (64, 128, 192):
        assert r1.latestOffset() == {"seq": expect}
        r1.commit({"seq": expect})

    # Fresh reader, same progress file == process restart.
    r2 = _stream_reader({"progress_path": progress, "batch_seqs": "64",
                         "n_per_symbol": "256"})
    assert r2.latestOffset() == {"seq": 256}  # resumes PAST 192
    parts = r2.partitions({"seq": 192}, {"seq": 256})
    assert all(p.lo == 192 and p.hi == 256 for p in parts)


def test_progress_file_is_monotone_under_replayed_commit(tmp_path):
    """An out-of-order / replayed commit (Spark CAN re-commit an old
    batch after recovery) must never regress the persisted cursor a
    later restart relies on: the file stores max(cursor, end), not
    the raw end."""
    progress = str(tmp_path / "progress")
    r = _stream_reader({"progress_path": progress, "batch_seqs": "64",
                        "n_per_symbol": "256"})
    for expect in (64, 128):
        assert r.latestOffset() == {"seq": expect}
        r.commit({"seq": expect})
    r.commit({"seq": 64})  # replayed stale commit
    with open(progress) as fh:
        assert int(fh.read()) == 128  # file stayed monotone
    r2 = _stream_reader({"progress_path": progress, "batch_seqs": "64",
                         "n_per_symbol": "256"})
    assert r2.latestOffset() == {"seq": 192}  # resumes from 128, not 64


def test_stream_reader_clamps_regressed_range_without_progress():
    """Without progress_path (the fresh-checkpoint demo config), a
    restarted reader's first latestOffset CAN sit below the
    checkpoint's start — partitions must then plan an EMPTY range,
    never a negative one and never a re-emit of the committed span."""
    r = _stream_reader({"batch_seqs": "64", "n_per_symbol": "256"})
    assert r.latestOffset() == {"seq": 64}
    parts = r.partitions({"seq": 192}, {"seq": 64})
    assert all(p.lo == 192 and p.hi == 192 for p in parts)  # empty
    assert sum(1 for p in parts for _ in r.read(p)) == 0
    # The planned range advanced the cursor: the NEXT trigger resumes
    # from past the committed offset instead of crawling from 64.
    assert r.latestOffset() == {"seq": 256}

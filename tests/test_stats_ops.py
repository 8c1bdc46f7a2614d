"""Reference-implementation tests for the statistical QA operators
(`operators/stats.py`): each Spark result is checked against a
brute-force pure-Python computation on crafted series — independent
of the DuckDB oracle, so a shared misunderstanding of the statistic
in both SQL dialects cannot hide."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _mk_events(spark, rows):
    """rows: (user_id, event_id, ts_offset_hours, value)."""
    return spark.createDataFrame(
        [(u, e, f"2024-01-01 {h:02d}:00:00", v) for u, e, h, v in rows],
        "user_id long, event_id long, ts_s string, value double",
    ).select("user_id", "event_id",
             F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")


def _mk_brute(series):
    """Mann–Kendall on one ordered value list."""
    n = len(series)
    s = sum((v2 > v1) - (v2 < v1)
            for i, v1 in enumerate(series) for v2 in series[i + 1:])
    ties = {}
    for v in series:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


def test_mann_kendall_matches_brute_force(spark, monkeypatch, tmp_path):
    from big_data_share_market_spark.operators import stats

    series = {1: [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0],   # ties
              2: [1.0, 2.0, 3.0, 4.0, 5.0],                   # monotone up
              3: [5.0, 4.0, 3.0, 2.0, 1.0]}                   # monotone down
    rows = [(u, 10 * u + i, i, v)
            for u, vs in series.items() for i, v in enumerate(vs)]
    df = _mk_events(spark, rows)
    monkeypatch.setattr(stats, "load_table", lambda *_: df)
    got = {r.user_id: r for r in
           stats.q_mann_kendall_trend(spark, "unused").collect()}
    for u, vs in series.items():
        s, var, z = _mk_brute(vs)
        assert got[u].s_stat == s, u
        assert got[u].var_s == var, u
        assert abs(got[u].z - z) < 1e-12, u
    # Monotone series hit the no-tie extreme: S = ±n(n−1)/2.
    assert got[2].s_stat == 10 and got[3].s_stat == -10


def _ks_brute(xs, ys):
    pts = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    return max(abs(sum(x <= p for x in xs) * nb
                   - sum(y <= p for y in ys) * na) for p in pts)


def test_ks_two_sample_matches_brute_force(spark, monkeypatch):
    from big_data_share_market_spark.operators import stats

    xs = [1.0, 2.5, 2.5, 7.0, 40.0, 41.5, 300.0]       # spans buckets
    ys = [0.5, 2.5, 3.0, 18.0, 40.0, 200.0, 310.0, 5.0]
    rows = ([(1, i, 0, v) for i, v in enumerate(xs)]
            + [(2, 100 + i, 0, v) for i, v in enumerate(ys)])
    df = _mk_events(spark, rows).withColumn(
        "event_type",
        F.when(F.col("user_id") == 1, "click").otherwise("purchase"))
    monkeypatch.setattr(stats, "load_table", lambda *_: df)
    (row,) = stats.q_ks_two_sample(spark, "unused").collect()
    d_num = _ks_brute(xs, ys)
    assert (row.n_a, row.n_b) == (len(xs), len(ys))
    assert row.d_num == d_num
    assert row.d_stat == d_num / (len(xs) * len(ys))


def test_cusum_finds_planted_level_shift(spark, monkeypatch):
    from big_data_share_market_spark.operators import stats

    # 10 points at 0, then 10 at 10: CUSUM is extremal exactly at the
    # boundary (rank 10), |S| = 10*(0-5) = 50.
    vals = [0.0] * 10 + [10.0] * 10
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    df = _mk_events(spark, rows)
    monkeypatch.setattr(stats, "load_table", lambda *_: df)
    (row,) = stats.q_cusum_changepoint(spark, "unused").collect()
    assert row.n == 20
    assert row.argmax_rank == 10
    assert row.argmax_event_id == 9
    assert row.max_abs_cusum == 50.0


def _mwu_brute(xs, ys):
    """2*U_A and tie-corrected Var(U) by definition."""
    u2 = 0
    for x in xs:
        for y in ys:
            u2 += 2 if x > y else (1 if x == y else 0)
    n_a, n_b = len(xs), len(ys)
    n = n_a + n_b
    from collections import Counter
    tie_sum = sum(c ** 3 - c for c in Counter(xs + ys).values())
    var = n_a * n_b / 12 * ((n + 1) - tie_sum / (n * (n - 1)))
    return u2, var


def test_mannwhitney_matches_brute_force(spark, monkeypatch):
    from big_data_share_market_spark.operators import stats

    xs = [1.0, 2.5, 2.5, 7.0, 40.0, 41.5, 300.0, 2.5]
    ys = [0.5, 2.5, 3.0, 18.0, 40.0, 200.0, 310.0, 5.0, 41.5]
    rows = ([(1, i, 0, v) for i, v in enumerate(xs)]
            + [(2, 100 + i, 0, v) for i, v in enumerate(ys)])
    df = _mk_events(spark, rows).withColumn(
        "event_type",
        F.when(F.col("user_id") == 1, "click").otherwise("purchase"))
    monkeypatch.setattr(stats, "load_table", lambda *_: df)
    (row,) = stats.q_mannwhitney_u(spark, "unused").collect()
    u2, var = _mwu_brute(xs, ys)
    assert (row.n_a, row.n_b) == (len(xs), len(ys))
    assert row.u2_a == u2
    assert abs(row.var_u - var) < 1e-9

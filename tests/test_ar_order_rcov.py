"""Brute-force reference tests for the r10 additions:
`ar_order_select` (composition of the ACF/PACF/Ljung-Box kit) is
checked for internal consistency against the component queries it
composes; `rolling_covariance`, `variance_ratio` and
`cross_sectional_momentum` against independent pure-Python
computations on the actual fixture returns — so a shared
misunderstanding in both SQL dialects cannot hide behind a hash
match."""

from __future__ import annotations

import math

from .conftest import SF_DIR

_Z = 1.959963984540054


def test_ar_order_consistent_with_components(spark):
    """ar_order must be exactly what a reader of the two component
    tables would conclude: 0 when Ljung-Box cannot reject whiteness,
    else the LAST lag whose |PACF| clears the +-z/sqrt(n) band."""
    from big_data_share_market_spark.operators.finance import (
        _ACF_LAGS, q_ar_order_select, q_ljung_box_whiteness,
        q_pacf_durbin_levinson)

    order = {r.user_id: r for r in
             q_ar_order_select(spark, SF_DIR).collect()}
    lb = {r.user_id: r for r in
          q_ljung_box_whiteness(spark, SF_DIR).collect()}
    pacf = {r.user_id: r for r in
            q_pacf_durbin_levinson(spark, SF_DIR).collect()}
    assert order and set(order) == set(lb) == set(pacf)
    for u, row in order.items():
        assert row.not_white_noise == lb[u].not_white_noise, u
        assert row.q_lb == lb[u].q_lb, u
        if not row.not_white_noise:
            assert row.ar_order == 0, u
            continue
        thr = _Z / math.sqrt(row.n)
        expect = 0
        for k in range(_ACF_LAGS, 0, -1):
            v = getattr(pacf[u], f"pacf_{k}")
            if v is not None and abs(v) > thr:
                expect = k
                break
        assert row.ar_order == expect, (u, row.ar_order, expect)


def _matched_daily_pairs(spark):
    """Per-pair matched daily integer return series from the engine's
    own _daily_rets frame (small at sf0.001: 15 keys x <=29 days)."""
    from big_data_share_market_spark.operators.finance import _daily_rets

    rows = (_daily_rets(spark, SF_DIR)
            .orderBy("user_id", "day_ts").collect())
    by_key: dict[int, dict] = {}
    for r in rows:
        by_key.setdefault(r.user_id, {})[r.day_ts] = r.ret_i
    keys = sorted(by_key)
    pairs = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            days = sorted(set(by_key[a]) & set(by_key[b]))
            if days:
                pairs[(a, b)] = [(d, by_key[a][d], by_key[b][d])
                                 for d in days]
    return pairs


def test_rolling_covariance_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _Q, _RCOV_W, q_rolling_covariance)

    got = {(r.user_a, r.user_b, r.day_ts): r for r in
           q_rolling_covariance(spark, SF_DIR).collect()}
    assert got
    pairs = _matched_daily_pairs(spark)
    checked = 0
    for (a, b), series in pairs.items():
        for idx in range(_RCOV_W - 1, len(series)):
            window = series[idx - _RCOV_W + 1:idx + 1]
            day = series[idx][0]
            xs = [w[1] for w in window]
            ys = [w[2] for w in window]
            n = float(_RCOV_W)
            sx, sy = float(sum(xs)), float(sum(ys))
            sxy = float(sum(x * y for x, y in zip(xs, ys)))
            sxx = float(sum(x * x for x in xs))
            syy = float(sum(y * y for y in ys))
            row = got.pop((a, b, day))
            ref_cov = ((n * sxy - sx * sy) / (n * (n - 1))) / float(_Q) ** 2
            assert math.isclose(row.cov, ref_cov, rel_tol=1e-9), (a, b, day)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx > 0 and vy > 0:
                ref_corr = (n * sxy - sx * sy) / math.sqrt(vx * vy)
                assert math.isclose(row.corr, ref_corr, rel_tol=1e-9)
                assert -1.0 - 1e-12 <= row.corr <= 1.0 + 1e-12
            else:
                assert row.corr is None
            checked += 1
    # Every engine row must have been predicted by the brute force —
    # and nothing the brute force predicts may be missing.
    assert not got, f"unexpected engine rows: {list(got)[:3]}"
    assert checked > 100


def _hourly_series(spark):
    from big_data_share_market_spark.operators.finance import _rets

    rows = (_rets(spark, SF_DIR).select("user_id", "bar_ts", "ret_i")
            .orderBy("user_id", "bar_ts").collect())
    series: dict[int, list[int]] = {}
    for r in rows:
        series.setdefault(r.user_id, []).append(r.ret_i)
    return series


def test_variance_ratio_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _VR_ASY, _VR_Q, q_variance_ratio)

    got = {r.user_id: r for r in
           q_variance_ratio(spark, SF_DIR).collect()}
    assert got
    for u, xs in _hourly_series(spark).items():
        n1 = len(xs)
        if n1 <= 2 * _VR_Q:
            assert u not in got
            continue
        ys = [sum(xs[i - _VR_Q + 1:i + 1])
              for i in range(_VR_Q - 1, n1)]
        s1, ss1 = float(sum(xs)), float(sum(x * x for x in xs))
        var1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
        if var1 <= 0:
            assert u not in got
            continue
        n2 = len(ys)
        s2, ss2 = float(sum(ys)), float(sum(y * y for y in ys))
        varq = (ss2 - s2 * s2 / n2) / (n2 - 1)
        vr = varq / (_VR_Q * var1)
        z = (vr - 1.0) / math.sqrt(_VR_ASY / n1)
        row = got.pop(u)
        assert row.n == n1
        assert math.isclose(row.vr, vr, rel_tol=1e-9), u
        assert math.isclose(row.z_vr, z, rel_tol=1e-9), u
        assert row.rejects_random_walk == (abs(z) > _Z), u
    assert not got


def test_cross_sectional_momentum_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _Q, _daily_rets, q_cross_sectional_momentum)

    rows = (_daily_rets(spark, SF_DIR)
            .orderBy("user_id", "day_ts").collect())
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append((r.day_ts, r.ret_i))
    by_day: dict = {}
    for series in by_key.values():
        for (d0, x), (d1, y) in zip(series, series[1:]):
            by_day.setdefault(d1, []).append((x, y))

    got = {r.day_ts: r for r in
           q_cross_sectional_momentum(spark, SF_DIR).collect()}
    assert got
    for day, pts in by_day.items():
        n = len(pts)
        sx = float(sum(p[0] for p in pts))
        sy = float(sum(p[1] for p in pts))
        sxy = float(sum(p[0] * p[1] for p in pts))
        sxx = float(sum(p[0] * p[0] for p in pts))
        den = n * sxx - sx * sx
        if n < 3 or den == 0:
            assert day not in got
            continue
        gamma = (n * sxy - sx * sy) / den
        alpha = ((sy - gamma * sx) / n) / float(_Q)
        row = got.pop(day)
        assert row.n_keys == n
        assert math.isclose(row.gamma, gamma, rel_tol=1e-9), day
        assert math.isclose(row.alpha, alpha, rel_tol=1e-9,
                            abs_tol=1e-15), day
    assert not got

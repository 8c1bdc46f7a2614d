"""Brute-force reference tests for the r10 additions:
`ar_order_select` (composition of the ACF/PACF/Ljung-Box kit) is
checked for internal consistency against the component queries it
composes, and `rolling_covariance` against an independent pure-Python
trailing-window computation on the actual fixture returns — so a
shared misunderstanding in both SQL dialects cannot hide behind a
hash match."""

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

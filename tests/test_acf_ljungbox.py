"""Brute-force reference tests for the r9 time-series QA additions:
`acf_multi_lag` (per-lag Pearson on the quantized return series) and
`ljung_box_whiteness` (standard pooled-denominator portmanteau) are
each checked against an independent pure-Python computation on the
ACTUAL fixture returns — so a shared misunderstanding of the
statistic in both SQL dialects cannot hide behind a hash match."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def _fixture_returns(spark):
    """The engine's own quantized per-key return series, collected
    once (sf0.001: a handful of keys x ~60 bars)."""
    from big_data_share_market_spark.operators.finance import _rets

    rows = (_rets(spark, SF_DIR)
            .select("user_id", "bar_ts", "ret_i")
            .orderBy("user_id", "bar_ts").collect())
    series: dict[int, list[int]] = {}
    for r in rows:
        series.setdefault(r.user_id, []).append(r.ret_i)
    return series


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    if n < 3 or vx <= 0 or vy <= 0:
        return None
    return (sxy - sx * sy / n) / math.sqrt(vx * vy)


def test_acf_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _ACF_LAGS, q_acf_multi_lag)

    series = _fixture_returns(spark)
    got = {(r.user_id, r.lag_k): r
           for r in q_acf_multi_lag(spark, SF_DIR).collect()}
    assert got
    checked = 0
    for u, xs in series.items():
        for k in range(1, _ACF_LAGS + 1):
            if len(xs) <= k:
                continue
            pairs_x = xs[k:]       # ret_t
            pairs_y = xs[:-k]      # ret_{t-k}
            row = got[(u, k)]
            assert row.n == len(pairs_x), (u, k)
            ref = _pearson(pairs_x, pairs_y)
            if ref is None:
                assert row.acf is None, (u, k)
            else:
                assert abs(row.acf - ref) < 1e-9, (u, k, row.acf, ref)
                checked += 1
    assert checked > 0


def _ljung_box(xs, lags):
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs) / n
    q = 0.0
    terms = []
    for k in range(1, lags + 1):
        ck = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n)) / n
        r = ck / c0
        terms.append(r * r / (n - k))
    for t in terms:  # left-to-right, matching the fixed association
        q += t
    return n * (n + 2) * q


def test_ljung_box_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _ACF_LAGS, q_ljung_box_whiteness)

    series = _fixture_returns(spark)
    got = {r.user_id: r
           for r in q_ljung_box_whiteness(spark, SF_DIR).collect()}
    assert got
    for u, xs in series.items():
        if len(xs) <= 2 * _ACF_LAGS:
            assert u not in got
            continue
        ref = _ljung_box(xs, _ACF_LAGS)
        row = got[u]
        assert row.n == len(xs)
        # The engine reconstructs centered sums from raw integer
        # moments; agreement to float noise certifies the algebra.
        assert abs(row.q_lb - ref) / max(ref, 1.0) < 1e-9, (
            u, row.q_lb, ref)
        assert row.not_white_noise == (ref > 11.070497693516351)


def _runs_ref(signs):
    """Pure-Python Wald–Wolfowitz on a +1/−1 list."""
    n1 = sum(1 for s in signs if s > 0)
    n2 = sum(1 for s in signs if s < 0)
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    e = 2.0 * n1 * n2 / n + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    return n1, n2, r, (r - e) / math.sqrt(var)


def test_runs_test_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        q_runs_test_randomness)

    series = _fixture_returns(spark)
    got = {r.user_id: r
           for r in q_runs_test_randomness(spark, SF_DIR).collect()}
    assert got
    checked = 0
    for u, xs in series.items():
        signs = [1 if x > 0 else -1 for x in xs if x != 0]
        n1 = sum(1 for s in signs if s > 0)
        n2 = len(signs) - n1
        if n1 == 0 or n2 == 0 or 2 * n1 * n2 <= n1 + n2:
            assert u not in got
            continue
        rn1, rn2, rr, rz = _runs_ref(signs)
        row = got[u]
        assert (row.n1, row.n2, row.r) == (rn1, rn2, rr), u
        assert abs(row.z_runs - rz) < 1e-9, (u, row.z_runs, rz)
        assert row.non_random == (abs(rz) > 1.959963984540054), u
        checked += 1
    assert checked > 0


def test_runs_test_flags_planted_structure():
    """Decision sanity on crafted sign sequences: perfect alternation
    (too many runs) and long blocks (too few) must both reject, a
    balanced coin-flip-ish sequence must not."""
    from tests.test_acf_ljungbox import _runs_ref  # self-import ok

    alt = [(-1) ** t for t in range(40)]
    assert abs(_runs_ref(alt)[3]) > 1.96
    blocks = [1] * 20 + [-1] * 20
    assert abs(_runs_ref(blocks)[3]) > 1.96
    # A fixed hash-derived bit sequence (md5("runs"), first 40 bits,
    # z = -0.84): inside the band.
    import hashlib
    bits = bin(int(hashlib.md5(b"runs").hexdigest(), 16))[2:][:40]
    mixed = [1 if b == "1" else -1 for b in bits]
    assert abs(_runs_ref(mixed)[3]) < 1.96


def _pacf_ref(xs, lags):
    """Pure-Python Durbin–Levinson on the standard ACF estimator."""
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs) / n
    r = [sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n)) / n / c0
         for k in range(1, lags + 1)]
    phi_prev = [r[0]]
    pacf = [r[0]]
    for k in range(2, lags + 1):
        num = r[k - 1] - sum(phi_prev[j - 1] * r[k - j - 1]
                             for j in range(1, k))
        den = 1 - sum(phi_prev[j - 1] * r[j - 1] for j in range(1, k))
        akk = num / den
        phi = [phi_prev[j - 1] - akk * phi_prev[k - j - 1]
               for j in range(1, k)] + [akk]
        pacf.append(akk)
        phi_prev = phi
    return pacf


def test_pacf_matches_brute_force(spark):
    from big_data_share_market_spark.operators.finance import (
        _ACF_LAGS, q_pacf_durbin_levinson)

    series = _fixture_returns(spark)
    got = {r.user_id: r
           for r in q_pacf_durbin_levinson(spark, SF_DIR).collect()}
    assert got
    checked = 0
    for u, xs in series.items():
        if u not in got:  # filtered by the n/variance guard
            continue
        ref = _pacf_ref(xs, _ACF_LAGS)
        row = got[u]
        for k in range(1, _ACF_LAGS + 1):
            val = getattr(row, f"pacf_{k}")
            assert abs(val - ref[k - 1]) < 1e-9, (u, k, val, ref[k - 1])
        checked += 1
    assert checked > 0


def test_pacf_cuts_off_for_planted_ar2():
    """The PACF's defining property: an AR(2) series has pacf_1,
    pacf_2 large and pacf_3..5 near zero — the cutoff IS the model
    order."""
    import hashlib

    def noise(t):  # hash-derived WHITE noise (an LCG-style formula
        # without state carries its own autocorrelation)
        h = int(hashlib.md5(f"ar2:{t}".encode()).hexdigest()[:8], 16)
        return (h % 10000 - 5000) / 5000.0

    xs = [0.0] * 400
    for t in range(2, 400):
        xs[t] = 0.6 * xs[t - 1] - 0.3 * xs[t - 2] + noise(t)
    pacf = _pacf_ref(xs[50:], 5)  # drop burn-in
    assert abs(pacf[0]) > 0.3 and abs(pacf[1]) > 0.2
    for k in (2, 3, 4):
        assert abs(pacf[k]) < 0.15, (k, pacf[k])


def test_ljung_box_flags_a_planted_ar1(spark):
    """Sanity of the DECISION: a strongly autocorrelated series must
    reject whiteness, an alternating one too, while the test keeps
    its size on the fixture's near-noise returns (not asserted per
    key — just that both planted structures trip the flag)."""
    xs_ar = [0] * 40
    for t in range(1, 40):
        xs_ar[t] = int(0.9 * xs_ar[t - 1] + ((t * 37) % 11 - 5) * 1000)
    assert _ljung_box(xs_ar, 5) > 11.070497693516351
    xs_alt = [(1 if t % 2 else -1) * (1000 + (t * 13) % 7)
              for t in range(40)]
    assert _ljung_box(xs_alt, 5) > 11.070497693516351

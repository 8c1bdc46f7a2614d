"""Sketch accuracy bounds: approximate operators register rows-only
(cross-engine sketch implementations differ), so their correctness
claim is an asserted error bound against the exact answer computed in
the same query — plus the merge-consistency invariant HLL pipelines
rely on."""

from __future__ import annotations

from big_data_share_market_spark.operators import sketches

from .conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    rows = sketches.q_approx_distinct_users(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # rsd=0.02; allow 5x headroom (guarantee is probabilistic).
        assert r.rel_err <= 0.10, (r.event_type, r.rel_err)


def test_approx_quantiles_close(spark):
    rows = sketches.q_approx_value_quantiles(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Sketch returns a member value vs interpolated exact rank:
        # bounded by one inter-value gap, well under 10% relative.
        assert r.max_rel_err <= 0.10, (r.event_type, r.max_rel_err)


def test_hll_union_matches_direct(spark):
    row = sketches.q_hll_merge_consistency(spark, SF_DIR).collect()[0]
    assert row.consistent, (row.merged_estimate, row.direct_estimate)


def test_mg_superset_guarantee():
    """Misra-Gries retention: after any weighted stream, every token
    with frequency > N/(k+1) must still be in the counter dict — the
    property q_heavy_hitters' candidate pass relies on. Adversarial
    shape: one heavy token drip-fed between bursts of distinct noise
    tokens engineered to force constant decrement churn."""
    from collections import Counter

    k = 8
    counters = {}
    truth = Counter()
    noise = 0
    for round_ in range(200):
        sketches.mg_update(counters, "heavy", 3, k)
        truth["heavy"] += 3
        for _ in range(10):  # fresh singletons each round: max churn
            tok = f"noise{noise}"
            noise += 1
            sketches.mg_update(counters, tok, 1, k)
            truth[tok] += 1
    n = sum(truth.values())
    assert truth["heavy"] * (k + 1) > n, "fixture must make heavy a hitter"
    assert "heavy" in counters
    assert len(counters) <= k


def test_mg_superset_guarantee_random():
    """Property form of the retention guarantee over arbitrary
    weighted streams: for ANY stream, every item whose total weight
    exceeds N/(k+1) is retained, and the counter budget holds."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 15), st.integers(1, 6)),
                    max_size=300))
    def check(stream):
        k = 4
        counters = {}
        truth = Counter()
        for item, wt in stream:
            sketches.mg_update(counters, f"t{item}", wt, k)
            truth[f"t{item}"] += wt
        n = sum(truth.values())
        assert len(counters) <= k
        for tok, cnt in truth.items():
            if cnt * (k + 1) > n:
                assert tok in counters, (tok, cnt, n, counters)

    check()

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

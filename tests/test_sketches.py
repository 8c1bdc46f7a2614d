"""Sketch accuracy bounds: cross-engine sketch implementations
differ, so the registered queries oracle-check deterministic
contracts (exact counts + bound booleans) while THESE tests measure
the raw estimates via the *_detail frames — the realized error bound
against the exact answer, plus the merge-consistency invariant HLL
pipelines rely on."""

from __future__ import annotations

from big_data_share_market_spark.operators import sketches

from .conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    rows = sketches.approx_distinct_detail(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # rsd=0.02; allow 5x headroom (guarantee is probabilistic).
        assert r.rel_err <= sketches._HLL_REL_ERR_BOUND, (
            r.event_type, r.rel_err)
    # The registered contract query mirrors this bound per row.
    for r in sketches.q_approx_distinct_users(spark, SF_DIR).collect():
        assert r.approx_within_bound, r.event_type


def test_approx_quantiles_close(spark):
    """The GK rank guarantee must hold on real data: every sketch
    answer lies between the exact DISC values at p ± 1/accuracy
    (this boolean is exactly what the query's DuckDB oracle pins to
    TRUE), and the exact quantiles are monotone in p."""
    rows = sketches.q_approx_value_quantiles(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.approx_within_bound, r.event_type
        assert r.p50_exact <= r.p90_exact <= r.p99_exact, r


def test_hll_union_matches_direct(spark):
    row = sketches.hll_merge_detail(spark, SF_DIR).collect()[0]
    assert row.consistent, (row.merged_estimate, row.direct_estimate)
    contract = sketches.q_hll_merge_consistency(spark, SF_DIR).collect()[0]
    assert contract.merge_consistent and contract.approx_within_bound


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


def test_quantile_sketch_bound_and_rows(spark):
    """The merged sketch's error contract, realized: every probe's
    exact DISC percentile lands inside the reported bucket (the
    by-construction bound the oracle also pins), buckets are one
    _QSK_W wide, and the cumulative count at the picked bucket
    actually covers the target rank."""
    import math
    rows = sketches.q_quantile_sketch_merge(spark, SF_DIR).collect()
    assert [r.p for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert r.contains_exact, r
        assert r.est_hi_cents - r.est_lo_cents == sketches._QSK_W
        assert r.cum >= r.bucket_n > 0
    # cum at p=0.99's bucket must cover ceil(0.99 * N)
    n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert rows[-1].cum >= math.ceil(0.99 * n)


def test_quantile_sketch_histogram_merges_exactly(spark):
    """Mergeability by construction: histograms built over ANY
    disjoint sharding of the data sum (bucket-wise) to the one-pass
    histogram, bit-exactly — the property GK/t-digest only give
    approximately, and the reason this sketch can carry a full
    merge ≡ recompute oracle."""
    from pyspark.sql import functions as F
    from big_data_share_market_spark.operators.sketches import _qsk_hist
    from big_data_share_market_spark.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    one_pass = {r.bucket: r["count"] for r in _qsk_hist(orders).collect()}
    for n_shards in (2, 5):
        summed: dict = {}
        for s in range(n_shards):
            shard = _qsk_hist(
                orders.filter(F.col("o_orderkey") % n_shards == s))
            for r in shard.collect():
                summed[r.bucket] = summed.get(r.bucket, 0) + r["count"]
        assert summed == one_pass, n_shards


def test_kmv_exact_branch_and_estimate(spark):
    """sf0.001 has 15 distinct users < k=64, so the sketch IS the set
    and the estimate must be exactly the distinct count (the KMV
    small-cardinality rule); at sf0.01 (150 users >= k) the estimator
    kicks in and must land within the loose 3-sigma band
    (~3/sqrt(k-2) ≈ 40%) of truth."""
    r = sketches.q_kmv_distinct_merge(spark, SF_DIR).collect()[0]
    assert r.k_n == r.exact_distinct == 15
    assert r.est_distinct == 15.0 and r.rel_err == 0.0
    r2 = sketches.q_kmv_distinct_merge(
        spark, "/root/testdata/sf0.01").collect()[0]
    assert r2.k_n == sketches._KMV_K
    assert r2.exact_distinct == 150
    assert abs(r2.rel_err) < 0.40, r2


def test_kmv_sketch_merges_exactly(spark):
    """The KMV merge is an ORDER STATISTIC, not an approximation: the
    k smallest of the union of per-shard k-smallest sets equals the k
    smallest over all distinct hashes, for any disjoint sharding —
    the property that lets this sketch carry a merge ≡ recompute
    oracle where HLL cannot."""
    from pyspark.sql import functions as F
    from big_data_share_market_spark.tables import load_table

    sfd = "/root/testdata/sf0.01"
    ev = load_table(spark, sfd, "events")
    h = F.expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
               " 16, 10) AS BIGINT)")
    one_pass = [r.h for r in
                (ev.select(h.alias("h")).distinct()
                 .orderBy("h").limit(sketches._KMV_K)).collect()]
    for n_shards in (3, 7):
        per_shard = []
        for s in range(n_shards):
            shard = (ev.filter(F.col("event_id") % n_shards == s)
                     .select(h.alias("h")).distinct()
                     .orderBy("h").limit(sketches._KMV_K))
            per_shard.extend(r.h for r in shard.collect())
        merged = sorted(set(per_shard))[:sketches._KMV_K]
        assert merged == one_pass, n_shards


def test_grouped_quantile_sketch_bound_per_group(spark):
    """Every (group, probe) row must contain its group's exact DISC
    percentile (the per-group error contract), with 5 priorities x 3
    probes and monotone bucket picks within each group."""
    rows = sketches.q_grouped_quantile_sketch(spark, SF_DIR).collect()
    assert len(rows) == 15
    by_group: dict = {}
    for r in rows:
        assert r.contains_exact, r
        assert r.est_hi_cents - r.est_lo_cents == sketches._QSK_W
        by_group.setdefault(r.o_orderpriority, []).append(r)
    for grp, rs in by_group.items():
        ps = [r.p for r in rs]
        assert ps == [0.5, 0.9, 0.99], grp
        assert rs[0].bucket <= rs[1].bucket <= rs[2].bucket, grp

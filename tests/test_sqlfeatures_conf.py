"""Session-conf hygiene for the recursive-CTE query: the raised
`spark.sql.cteRecursionRowLimit` must be scoped to the query's own
execution (the recursion materializes eagerly via localCheckpoint
inside the try, and the finally restores the prior value), so running
`q_recursive_cte_kalman` leaves the session conf exactly as found —
no ratchet for later fixtures or unrelated queries to inherit."""

from __future__ import annotations

from tests.conftest import SF_DIR

_KEY = "spark.sql.cteRecursionRowLimit"


def test_recursive_cte_restores_recursion_limit_conf(spark):
    from big_data_share_market_spark.operators.sqlfeatures import (
        q_recursive_cte_kalman)

    prior = spark.conf.get(_KEY, None)
    try:
        df = q_recursive_cte_kalman(spark, SF_DIR)
        # The frame must already be materialized (lineage truncated):
        # collecting it after the conf was restored must still work.
        assert spark.conf.get(_KEY, None) == prior
        n = df.count()
        assert n > 0
    finally:
        # Belt-and-braces: never let THIS test leak conf either.
        if prior is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prior)


def test_recursive_cte_restores_an_explicitly_set_value(spark):
    from big_data_share_market_spark.operators.sqlfeatures import (
        q_recursive_cte_kalman)

    prior = spark.conf.get(_KEY, None)
    try:
        spark.conf.set(_KEY, "1234567")
        df = q_recursive_cte_kalman(spark, SF_DIR)
        assert spark.conf.get(_KEY) == "1234567"
        assert df.count() > 0
    finally:
        if prior is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, prior)

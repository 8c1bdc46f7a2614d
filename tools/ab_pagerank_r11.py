#!/usr/bin/env python
"""Same-session A/B for the r11 pagerank frontier-width fix: the r10
form (per-round groupBy left to the 64k AQE coalescing floor) vs the
r11 form (node-count-derived coalesce on each round's rank relation).
Alternating reps after one warmup each; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_share_market_spark.operators import graph  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pagerank_r10(spark, sf_dir):
    """The r10 loop body, verbatim minus the r11 coalesce."""
    adj, n, _n_edges = graph._co_adjacency(spark, sf_dir)
    base = ((graph._DAMP_DEN - graph._DAMP_NUM) * graph._TOTAL
            // (graph._DAMP_DEN * n))
    ranks = adj.select(F.col("src").alias("node"),
                       F.lit(graph._TOTAL // n).cast("long").alias("units"))
    for _ in range(graph._ITERS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(F.explode("dsts").alias("dst"),
                    F.expr("units div outdeg").alias("c")))
        ranks = (
            contribs.groupBy("dst").agg(F.sum("c").alias("s"))
            .select(F.col("dst").alias("node"),
                    (F.lit(base).cast("long")
                     + F.expr(f"({graph._DAMP_NUM} * s) div {graph._DAMP_DEN}")
                     ).alias("units")))
    return ranks.select(
        "node", "units",
        (F.col("units").cast("double")
         / F.lit(float(graph._TOTAL))).alias("rank"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-pagerank-r11")
    forms = {"r10_floor": pagerank_r10, "r11_coalesce": graph.q_part_pagerank}
    for name, fn in forms.items():  # warmups (stage adjacency once)
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times = {name: [] for name in forms}
    for _ in range(reps):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    # Result parity between the two forms (coalesce must be a pure
    # layout change): sorted rows identical.
    a = sorted(map(tuple, pagerank_r10(spark, SF_DIR).collect()))
    b = sorted(map(tuple, graph.q_part_pagerank(spark, SF_DIR).collect()))
    print(json.dumps({"times": times,
                      "mins": {n: min(t) for n, t in times.items()},
                      "rows_equal": a == b, "n_rows": len(a)}))


if __name__ == "__main__":
    main()

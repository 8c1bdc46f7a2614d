#!/usr/bin/env python
"""Same-session alternating A/B for the r11 part_kcore change (AQE
scoped OFF around the eager peel loop, restored for the lazy result).
The r10 form is reproduced inline, verbatim minus the scope."""

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


def kcore_r10(spark, sf_dir):
    edges = graph._repeat_edges(spark, sf_dir)
    active = (edges.select(F.col("src").alias("node")).distinct()
              .coalesce(1).localCheckpoint())
    n_active = active.count()
    peeled = []
    for i in range(1, graph._KCORE_ROUNDS + 1):
        sa = active.select(F.col("node").alias("src"))
        sb = active.select(F.col("node").alias("dst"))
        deg = (edges
               .join(F.broadcast(sa), "src")
               .join(F.broadcast(sb), "dst")
               .groupBy("src").agg(F.count("*").alias("c")))
        surv = (deg.filter(F.col("c") >= graph._KCORE_K)
                .select(F.col("src").alias("node"))
                .coalesce(1).localCheckpoint())
        peeled.append(
            active.join(F.broadcast(surv), "node", "left_anti")
            .select("node", F.lit(i).alias("peel_round")))
        n_surv = surv.count()
        removed_any = n_surv != n_active
        active, n_active = surv, n_surv
        if not removed_any:
            break
    sa = active.select(F.col("node").alias("src"))
    sb = active.select(F.col("node").alias("dst"))
    core_deg = (edges
                .join(F.broadcast(sa), "src")
                .join(F.broadcast(sb), "dst")
                .groupBy("src").agg(F.count("*").alias("core_degree")))
    core = (active.join(
        F.broadcast(core_deg.withColumnRenamed("src", "node")),
        "node", "left")
            .select("node", F.lit(None).cast("int").alias("peel_round"),
                    "core_degree"))
    out = core
    for p in peeled:
        out = out.unionByName(
            p.select("node", "peel_round",
                     F.lit(None).cast("long").alias("core_degree")))
    return out.orderBy("node")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-kcore-r11")
    forms = {"r10": kcore_r10, "r11_scoped_aqe": graph.q_part_kcore}
    for name, fn in forms.items():
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times = {name: [] for name in forms}
    for _ in range(reps):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    a = [tuple(r) for r in kcore_r10(spark, SF_DIR).collect()]
    b = [tuple(r) for r in graph.q_part_kcore(spark, SF_DIR).collect()]
    print(json.dumps({"times": times,
                      "mins": {n: min(t) for n, t in times.items()},
                      "rows_equal_in_order": a == b, "n_rows": len(a),
                      "aqe_restored": spark.conf.get(
                          "spark.sql.adaptive.enabled")}))


if __name__ == "__main__":
    main()

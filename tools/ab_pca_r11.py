#!/usr/bin/env python
"""Same-session alternating A/B for the r11 pca_power_iteration
driver-overhead fix (AQE-off scoped around the 3 eager collect steps;
1-partition pre-ordered output frame with an in-partition sort).
Prints one JSON line with alternating-rep timings and row parity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_share_market_spark.operators import similarity as sim  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402
from big_data_share_market_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pca_r10(spark, sf_dir):
    """The r10 form, verbatim: AQE-governed collect steps + a global
    orderBy over the default-parallelism createDataFrame."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = [0.125] * sim._DIM
    lam = None
    for _ in range(sim._PCA_ITERS):
        varr = F.array(*[F.lit(float(c)) for c in v])
        s = F.expr(sim._DOT.format(a="embedding", b="varr"))
        scored = emb.withColumn("varr", varr).withColumn("s", s)
        rows = (scored
                .select("s", F.posexplode("embedding").alias("dim", "x"))
                .groupBy("dim")
                .agg(F.sum((F.col("s") * F.col("x").cast("double"))
                           .cast("decimal(25,6)"))
                     .cast("double").alias("w"))
                .collect())
        w_by_dim = {r["dim"]: r["w"] for r in rows}
        w = [w_by_dim[j] for j in range(sim._DIM)]
        lam = max(abs(c) for c in w)
        v = [c / lam for c in w]
    out = spark.createDataFrame(
        [(j, v[j], lam) for j in range(sim._DIM)],
        "dim bigint, v_x double, lambda_inf double")
    return out.orderBy("dim")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-pca-r11")
    forms = {"r10": pca_r10, "r11": sim.q_pca_power_iteration}
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
    a = [tuple(r) for r in pca_r10(spark, SF_DIR).collect()]
    b = [tuple(r) for r in sim.q_pca_power_iteration(spark, SF_DIR).collect()]
    print(json.dumps({"times": times,
                      "mins": {n: min(t) for n, t in times.items()},
                      "rows_equal_in_order": a == b, "n_rows": len(a)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Isolated single-query probe: fresh session, one untimed warmup
(stages any persisted relations), N timed noop-sink reps, bracketed by
the bench's 32-thread CPU control. Prints one JSON line.

Usage: python tools/probe_query.py <query> [reps=3]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.registry import all_queries  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ctrl() -> float:
    import threading

    import numpy as np
    rng = np.random.default_rng(7)
    x = rng.standard_normal(2_000_000)
    out = [0.0] * 32

    def _spin(i):
        s = 0.0
        for _ in range(4):
            s += float(np.sort(x)[::97].sum())
        out[i] = s

    ths = [threading.Thread(target=_spin, args=(i,)) for i in range(32)]
    t0 = time.perf_counter()
    [t.start() for t in ths]
    [t.join() for t in ths]
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fn, _ = all_queries()[name]
    spark = get_spark(app_name=f"probe-{name}")
    spark.sparkContext.setJobDescription(f"probe:{name}")
    c0 = _ctrl()
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    cold = round(time.perf_counter() - t0, 3)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    c1 = _ctrl()
    print(json.dumps({"query": name, "cold": cold, "reps": times,
                      "ctrl32_before": c0, "ctrl32_after": c1,
                      "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()

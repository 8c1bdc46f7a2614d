#!/usr/bin/env python
"""A/B artifact: the r7 across-key VECTORIZED ewm/Kalman kernels vs
the scalar reference loop, same session, same fixture — the recorded
answer to the r7 verdict's open question ("did the vectorized rewrite
regress sf0.1 CPU? unfalsified until the A/B artifact exists").

Both lanes execute the SAME queries through the SAME plan; the only
difference is `ewm.FORCE_SCALAR_KERNEL` (captured into the kernel
closures at plan-build time — a monkeypatch would not survive the
worker re-import), which routes every Arrow batch through the scalar
reference loops — the pre-r7 kernel bodies, kept as the bit-identity
reference (tests/test_pandas_parity.py pins vectorized ≡ scalar), so
the A/B isolates pure kernel CPU with zero plan noise.

Usage: python tools/ab_ewm_kernel.py [SF_DIR ...]
Writes ABLATION_EWM.json at the repo root (one entry per SF_DIR) and
prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.operators import ewm
from big_data_share_market_spark.registry import all_queries
from big_data_share_market_spark.session import get_spark

QUERIES = ("ema", "adx", "kalman_level")
REPS = 5
MODES = ("vectorized", "scalar")


def _run_once(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _kernel_micro() -> list[dict]:
    """Spark-free kernel timing — the clean CPU signal with zero
    plan/scheduler/JVM noise: synthetic Arrow-batch-shaped frames at
    the fixture's series-length distribution (45-99 rows/key), both
    paths, 20 reps each. This is what adjudicates 'did the r7
    vectorization regress kernel CPU' (answer: no — dense wins at
    every batch width, 1.3x at 47 segs to 6.6x at 2000 segs; the
    query-level deltas are scheduler/host noise)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    specs = [("ema_5", ("close", 2 / 6)), ("ema_15", ("close", 2 / 16))]
    rows = []
    for n_segs in (47, 150, 500, 2000):
        lens = rng.integers(45, 99, n_segs)
        pdf = pd.DataFrame({
            "user_id": np.repeat(np.arange(n_segs), lens),
            "close": rng.normal(100, 5, int(lens.sum()))})
        res = {"n_segs": n_segs, "n_rows": len(pdf)}
        for mode in MODES:
            ewm.FORCE_SCALAR_KERNEL = (mode == "scalar")
            kern = ewm._ewm_kernel(specs, "user_id")
            t0 = time.perf_counter()
            for _ in range(20):
                list(kern(iter([pdf])))
            res[f"{mode}_ms"] = round(
                (time.perf_counter() - t0) / 20 * 1000, 2)
        ewm.FORCE_SCALAR_KERNEL = False
        res["speedup"] = round(res["scalar_ms"] / res["vectorized_ms"], 2)
        rows.append(res)
    return rows


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    queries = all_queries()
    spark = get_spark(app_name="ab-ewm-kernel")
    out = {"queries": QUERIES, "reps_per_mode": REPS, "runs": [],
           "protocol": ("per sf_dir: untimed warmup of every "
                        "(mode, query) combo, then REPS interleaved "
                        "A/B passes (mode alternates inside each "
                        "pass) so JVM warmup and host drift land on "
                        "both lanes equally — the v1 protocol ran "
                        "the whole vectorized lane first in a cold "
                        "session and misread warmup as a 4x kernel "
                        "regression")}
    for sf_dir in sf_dirs:
        entry = {"sf_dir": sf_dir,
                 "vectorized": {n: {"reps": []} for n in QUERIES},
                 "scalar": {n: {"reps": []} for n in QUERIES}}
        for mode in MODES:  # warmup every combo, untimed
            ewm.FORCE_SCALAR_KERNEL = (mode == "scalar")
            for name in QUERIES:
                fn, _ = queries[name]
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
        for _ in range(REPS):
            for mode in MODES:
                ewm.FORCE_SCALAR_KERNEL = (mode == "scalar")
                for name in QUERIES:
                    fn, _ = queries[name]
                    entry[mode][name]["reps"].append(
                        _run_once(fn, spark, sf_dir))
        ewm.FORCE_SCALAR_KERNEL = False
        for mode in MODES:
            for name in QUERIES:
                reps = entry[mode][name]["reps"]
                entry[mode][name]["median"] = sorted(reps)[len(reps) // 2]
                entry[mode][name]["min"] = min(reps)
        entry["speedup_median"] = {
            name: round(entry["scalar"][name]["median"]
                        / max(entry["vectorized"][name]["median"], 1e-9), 3)
            for name in QUERIES}
        out["runs"].append(entry)
    out["kernel_micro"] = _kernel_micro()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ABLATION_EWM.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

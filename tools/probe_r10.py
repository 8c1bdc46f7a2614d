#!/usr/bin/env python
"""Round-10 scale probes (SCALING.md addendum 18 input).

Times, at one or more fixture dirs, with a bench-style parallel CPU
control probe bracketing every query (cold, warm, warm) so any host
contention is quantified rather than guessed:

- the four r10 additions: ar_order_select, rolling_covariance,
  variance_ratio, cross_sectional_momentum;
- the FUSED fk_integrity_audit (one scan per child since r10 — the
  r9 addendum row measured the six-anti-join form, so a fresh row
  shows what the fusion bought);
- the two envelope-margin queries the verdict wants re-probed
  isolated-quiet each round: theil_sen_trend, part_triangles.

Usage: python tools/probe_r10.py [fixture_dir ...]
       (default: /root/testdata/sf0.1 /tmp/bdsm_sf10)
Prints one JSON line per (fixture, query) and a final summary line;
paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _control_probe  # noqa: E402
from big_data_share_market_spark.registry import all_queries  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402

QUERIES = [
    "ar_order_select", "rolling_covariance", "variance_ratio",
    "cross_sectional_momentum", "fk_integrity_audit",
    "theil_sen_trend", "part_triangles",
]


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/bdsm_sf10"]
    qs = all_queries()
    spark = get_spark(app_name="probe-r10")
    out = {}
    for d in dirs:
        if not os.path.isdir(d):
            print(json.dumps({"fixture": d, "skipped": "missing"}))
            continue
        for name in QUERIES:
            fn, _ = qs[name]
            ctrl0 = _control_probe(spark)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 2))
            ctrl1 = _control_probe(spark)
            row = {"fixture": d, "query": name, "cold": reps[0],
                   "warm": reps[1:], "ctrl_before": ctrl0,
                   "ctrl_after": ctrl1}
            out[(d, name)] = row
            print(json.dumps(row), flush=True)
    summary = {f"{os.path.basename(d)}:{n}":
               {"cold": r["cold"], "warm_min": min(r["warm"]),
                "ctrl32": min(r["ctrl_before"].get("cpu_32t", 9e9),
                              r["ctrl_after"].get("cpu_32t", 9e9))}
               for (d, n), r in out.items()}
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()

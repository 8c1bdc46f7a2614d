#!/usr/bin/env python
"""Capture `.explain("formatted")` for a set of registry queries into
plans/r10/<query>_<tag>.txt — the before/after plan evidence for the
round-10 optimization deliverable (OPTIMIZATION_r10.md).

Usage:
    python tools/capture_plans_r10.py <tag> [query ...]

<tag> is `before` or `after`. With no query names, captures the
default round-10 optimization target set. Runs at sf0.1 (the bench SF)
so plan shapes match what the bench times; planning only — nothing
executes except the staged-relation builds a plan references.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.plans import explain_str  # noqa: E402
from big_data_share_market_spark.registry import all_queries  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r10")


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    assert not unknown, f"unknown queries: {unknown}"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="bdsm-plan-capture-r10")
    for name in names:
        fn, _ = queries[name]
        if name.startswith("stream_"):
            # Streaming queries execute on build (replay to a memory
            # sink); their "plan" evidence is the batch-side rollup.
            continue
        df = fn(spark, SF_DIR)
        text = explain_str(df, "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()

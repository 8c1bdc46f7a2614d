#!/usr/bin/env python
"""End-to-end probe of the composed 100 TB training-data story
(VERDICT r8 item 7): clean_corpus -> corpus_to_training_set ->
write_training_shards as ONE pipeline over a scale fixture,
recording wall time, peak/total shuffle, and the output layout
(the individual stages have sf10 probes in SCALING.md; this runs the
COMPOSITION the stages exist for).

The pipeline under test (all one lazy plan until the write):

  documents --quality gate--> exact dedup --> MinHash-LSH near-dup
    --> train-split hash predicate --> overlapping token chunks
    --> hash-sharded parquet (partitionBy(shard), maxRecordsPerFile)

Shuffle numbers come from Spark's status REST API (per-stage
shuffleReadBytes / shuffleWriteBytes — the history-server totals), so
"peak shuffle" is a recorded artifact, not a prose claim. Run with
SPARK_GRAFT_UI=true (set automatically below, before the session is
built).

Usage: python tools/composed_pipeline_probe.py [fixture_dir] [out_dir]
       (defaults: /tmp/bdsm_sf10 /tmp/bdsm_composed_shards)
Prints one JSON line; paste into SCALING.md's addendum.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.operators.packing import (
    training_chunks, write_training_shards)
from big_data_share_market_spark.session import get_spark


def _stage_metrics(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"
                                "?status=complete") as resp:
        stages = json.load(resp)
    return [{"stage": s["stageId"],
             "shuffle_write_b": s.get("shuffleWriteBytes", 0),
             "shuffle_read_b": s.get("shuffleReadBytes", 0)}
            for s in stages]


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bdsm_sf10"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdsm_composed_shards"
    shutil.rmtree(out_dir, ignore_errors=True)

    spark = get_spark(app_name="composed-pipeline-probe")

    t0 = time.perf_counter()
    chunks = training_chunks(spark, fixture)
    write_training_shards(chunks, out_dir)
    wall = time.perf_counter() - t0
    stage_rows = _stage_metrics(spark)

    # Verify the write from the OUTPUT (what a trainer's loader sees).
    t1 = time.perf_counter()
    written = spark.read.parquet(out_dir)
    n_rows = written.count()
    n_shards = written.select("shard").distinct().count()
    verify = time.perf_counter() - t1

    n_files = sum(len([f for f in files if f.endswith(".parquet")])
                  for _r, _d, files in os.walk(out_dir))
    out_bytes = sum(os.path.getsize(os.path.join(r, f))
                    for r, _d, files in os.walk(out_dir) for f in files)

    total_w = sum(s["shuffle_write_b"] for s in stage_rows)
    total_r = sum(s["shuffle_read_b"] for s in stage_rows)
    peak = max(stage_rows, default={"stage": None, "shuffle_write_b": 0},
               key=lambda s: s["shuffle_write_b"])
    print(json.dumps({
        "fixture": fixture,
        "pipeline_wall_sec": round(wall, 2),
        "verify_read_sec": round(verify, 2),
        "chunks_written": n_rows,
        "shards": n_shards,
        "files": n_files,
        "output_mb": round(out_bytes / 1e6, 1),
        "stages": len(stage_rows),
        "shuffle_write_total_mb": round(total_w / 1e6, 1),
        "shuffle_read_total_mb": round(total_r / 1e6, 1),
        "peak_stage_shuffle_write_mb": round(
            peak["shuffle_write_b"] / 1e6, 1),
        "peak_stage_id": peak["stage"],
    }))


if __name__ == "__main__":
    main()

"""Executed tests for the sharded training-set writer: directory
layout, per-file record bound, and lossless read-back."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from big_data_share_market_spark.operators.packing import (
    _N_SHARDS, q_shard_manifest, write_training_shards)
from big_data_share_market_spark.tables import load_table

from .conftest import SF_DIR


def test_write_training_shards_layout_and_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = tempfile.mkdtemp(prefix="shards-")
    try:
        write_training_shards(docs, out, max_records_per_file=16)

        shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
        assert [os.path.basename(d) for d in shard_dirs] == [
            f"shard={k}" for k in range(_N_SHARDS)]

        # Per-file record bound holds in every shard directory, and the
        # file count is exactly ceil(shard_rows / 16) — maxRecordsPerFile
        # splits files, it doesn't drop or duplicate rows.
        back = spark.read.parquet(out)
        counts = {r["shard"]: r["cnt"] for r in
                  back.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
        for d in shard_dirs:
            k = int(os.path.basename(d).split("=")[1])
            files = glob.glob(os.path.join(d, "*.parquet"))
            per_file = [spark.read.parquet(f).count() for f in files]
            assert max(per_file) <= 16
            assert sum(per_file) == counts[k]
            assert len(files) == -(-counts[k] // 16)

        # Round-trip: nothing lost, nothing duplicated, text intact.
        assert back.count() == docs.count()
        assert (back.select("doc_id", "text")
                .exceptAll(docs).count() == 0)
        assert (docs.exceptAll(back.select("doc_id", "text")).count() == 0)

        # The manifest's per-shard doc counts describe the written layout.
        manifest = {r["shard"]: r["n_docs"]
                    for r in q_shard_manifest(spark, SF_DIR).collect()}
        assert manifest == counts
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compact_small_files_roundtrip(spark):
    """Maintenance op: 64 tiny files -> right-sized files, rows and
    values preserved exactly, file count drops to ceil(rows/target).
    The audit dict is the compaction log record."""
    from big_data_share_market_spark.operators.scale import (
        compact_small_files)

    src = tempfile.mkdtemp(prefix="bdsm_compact_src")
    dst = tempfile.mkdtemp(prefix="bdsm_compact_dst")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value")
        ev.repartition(64).write.mode("overwrite").parquet(src)
        n_src_files = len(glob.glob(f"{src}/*.parquet"))
        assert n_src_files == 64

        stats = compact_small_files(spark, src, dst,
                                    target_rows_per_file=2000)
        assert stats["files_before"] == 64
        import math
        assert stats["files_after"] == max(
            1, math.ceil(stats["rows"] / 2000))
        assert stats["files_after"] < 64

        before = spark.read.parquet(src)
        after = spark.read.parquet(dst)
        assert after.count() == stats["rows"] == before.count()
        # value-exact: checksum both sides
        chk = lambda df: df.agg(
            F.sum("event_id"), F.sum("user_id"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))).collect()[0]
        assert chk(before) == chk(after)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)

"""Fixture table loaders.

All driver fixtures are single Parquet files per table
(`/root/testdata/sf*/NAME.parquet`, see TESTDATA.md). Loading stays a
plain `spark.read.parquet` so Catalyst keeps predicate pushdown,
column pruning, and partition-count autotuning
(`spark.sql.files.maxPartitionBytes` splits big files into tasks) — at
100 TB these would be directory-partitioned tables and the same call
prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# harness runs; fact tables never are.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects. Read nanos as int64 and truncate to micros —
        # exactly what DuckDB does (verified: ...778549829 ns → ...778549 µs),
        # so the oracle sees identical values. `div` is integral division
        # (a double divide would lose precision above 2^53).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition up to core count when the scan yields
    fewer partitions than cores. For CPU-bound per-row kernels (md5
    shingle hashing, tokenization) a single-file scan otherwise pins
    the whole map stage to ONE task; the explicit numPartitions form
    is exempt from AQE partition coalescing, so the width sticks. At
    100 TB the scan already has >= cores splits and this is a no-op
    (guarded by getNumPartitions), costing zero shuffles."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def kernel_width(df: DataFrame, per_partition_bytes: int = 128 << 20) -> int | None:
    """Scale-adaptive shuffle width for keyed partition-wide kernels
    (theil_sen_fit, _apply_ewm): with `repartition(key)` the width is
    `spark.sql.shuffle.partitions` — constant — so partition BYTES
    grow linearly with input and a 100 TB run walks into the §5
    spill/OOM cliff. When the optimizer's size estimate says the
    default width would exceed `per_partition_bytes` per partition,
    return the wider explicit count (ceil(bytes/target)); otherwise
    return None and the caller keeps the plain `repartition(key)`
    (identical plan at fixture scale, AQE coalescing intact). The
    estimate is the pre-shuffle optimized-plan size — conservative
    for these kernels, whose input is a pruned scan."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
        default = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return None
    if size >= 1 << 50:
        # "Unknown" sentinel (RDD-backed plans report
        # spark.sql.defaultSizeInBytes = Long.MaxValue): no usable
        # estimate — keep the session default rather than exploding
        # the width to 2^36 partitions.
        return None
    need = -(-size // per_partition_bytes)
    return need if need > default else None


def keyed_repartition(df: DataFrame, *cols: str,
                      per_partition_bytes: int = 128 << 20) -> DataFrame:
    """`df.repartition(*cols)` whose width scales with input bytes —
    see :func:`kernel_width`."""
    width = kernel_width(df, per_partition_bytes)
    if width is None:
        return df.repartition(*cols)
    return df.repartition(width, *cols)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

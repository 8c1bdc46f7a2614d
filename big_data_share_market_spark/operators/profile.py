"""Data-quality profiling: the validation pass a pipeline runs before
trusting a new drop of data. Beyond-reference scope (the reference
ships no data validation; its Report.docx "Lessons Learned" records a
column-length mismatch found only at runtime — SURVEY §5 — which is
exactly the failure class a profile catches at ingest).

Scale notes (100 TB): ONE aggregate pass computes every per-column
statistic simultaneously (Spark evaluates all aggregate expressions in
the same partial+final tree), so profiling costs a single scan and a
one-row shuffle regardless of column count. The row-per-column shape
comes from exploding the single result row — driver never touches
data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: (column, is_numeric) — lineitem's analytically relevant columns.
_COLS = (
    ("l_orderkey", True),
    ("l_quantity", True),
    ("l_extendedprice", True),
    ("l_discount", True),
    ("l_returnflag", False),
    ("l_linestatus", False),
    ("l_shipdate", False),
)


def q_dq_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of lineitem: row count, null count, exact
    distinct count, min/max (rendered as strings so one schema covers
    all types). One aggregate pass; the unpivot to a row per column is
    an explode of the single aggregated row."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, _num in _COLS:
        aggs += [
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .alias(f"{col}__nulls"),
            F.countDistinct(col).alias(f"{col}__distinct"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
    one = li.agg(*aggs)
    structs = [
        F.struct(
            F.lit(col).alias("column"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_value"),
            F.col(f"{col}__max").alias("max_value"),
        )
        for col, _num in _COLS
    ]
    return (one.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*").orderBy("column"))


def _profile_branch_sql(col: str) -> str:
    return f"""
  SELECT '{col}' AS "column", COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_nulls,
         COUNT(DISTINCT {col}) AS n_distinct,
         CAST(MIN({col}) AS VARCHAR) AS min_value,
         CAST(MAX({col}) AS VARCHAR) AS max_value
  FROM lineitem"""


_DQ_PROFILE_SQL = (
    "SELECT * FROM (\n"
    + "\n  UNION ALL\n".join(_profile_branch_sql(c) for c, _ in _COLS)
    + ')\nORDER BY "column"'
)


QUERIES = {
    "dq_profile_lineitem": (q_dq_profile_lineitem, _DQ_PROFILE_SQL),
}

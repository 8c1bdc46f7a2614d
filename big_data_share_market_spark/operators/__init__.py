"""Operator library: each module exports QUERIES, a dict of
``name -> (fn(spark, sf_dir) -> DataFrame, duckdb_oracle_sql | None)``.
The top-level registry merges them for the driver contract.
"""

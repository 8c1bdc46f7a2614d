"""Ingestion layer (SURVEY §2.A, §2.C): JSON envelope codec, recursive
schema flatten, UTC normalization, and connector builders (Kafka, JDBC
upsert, console dry-run).

The reference's ingest path is yfinance → JSON flatten → Kafka →
Flink JSON source → JDBC upsert sink. Here each hop is a composable
DataFrame transformation or a reader/writer builder; batch and
streaming share the same column expressions.
"""

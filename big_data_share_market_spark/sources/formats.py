"""Additional columnar/text source formats: CSV (with quoting +
PERMISSIVE tolerance) and ORC, each exercised END-TO-END — a
distributed write of the fixture into the format, a typed read back,
and an oracle certifying the round-trip lost nothing.

Parquet is the repo's primary format (every fixture table); JSON-lines
lives in json_io.py. These two close the remaining "could I point this
engine at the files I already have?" gaps: CSV is what ad-hoc exports
and legacy feeds actually arrive as, ORC is the other columnar format
a warehouse migration brings along. Kafka/Avro need packages absent
from this container (see sources/connectors.py for the Kafka
option-contract).

Scale notes: both writes are executor-parallel (one file per task, no
single-writer funnel); reads are format-native scans — ORC supports
predicate pushdown and column pruning exactly like parquet (same
FileScan machinery), CSV is a row format so the read is a full-width
text parse by design (the point of the round-trip is fidelity, not
layout — a 100 TB pipeline lands CSV once and converts to
parquet/ORC immediately, which is exactly what these queries do).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
}


def _docs_csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the documents table as quoted CSV once per sf_dir —
    distributed write, no driver collect (same staging pattern as the
    corrupt-JSONL scan, json_io.py)."""
    stage_dir = f"/tmp/bdsm_csv{sf_dir.replace('/', '_')}"
    marker = f"{stage_dir}/_SUCCESS"
    if not os.path.exists(marker):
        (load_table(spark, sf_dir, "documents")
         .write.mode("overwrite").options(**_CSV_OPTS).csv(stage_dir))
    return stage_dir


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV end-to-end: documents written as quoted CSV (header,
    RFC-4180 quote-doubling escape, explicit null token), read back
    with an explicit schema in PERMISSIVE mode. The oracle is the
    original table — the round-trip must be byte-faithful including
    multi-space text runs (`text` is quoted, so the parser cannot
    squeeze or split them) and embedded newlines (quoted by the
    writer; without multiLine the reader would split such a record
    across parse rows). Known caveat: a text field literally equal to
    the nullValue token backslash-N round-trips to NULL — inherent to
    CSV null encoding, not fixable without a different sentinel."""
    path = _docs_csv_dir(spark, sf_dir)
    schema = ("doc_id BIGINT, text STRING, lang STRING, "
              "source STRING, n_chars BIGINT")
    return (spark.read.schema(schema)
            .options(mode="PERMISSIVE", multiLine="true", **_CSV_OPTS)
            .csv(path)
            .select("doc_id", "text", "lang", "source", "n_chars"))


_CSV_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def _events_orc_dir(spark: SparkSession, sf_dir: str) -> str:
    stage_dir = f"/tmp/bdsm_orc{sf_dir.replace('/', '_')}"
    marker = f"{stage_dir}/_SUCCESS"
    if not os.path.exists(marker):
        (load_table(spark, sf_dir, "events")
         .write.mode("overwrite").orc(stage_dir))
    return stage_dir


def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC end-to-end: events written as ORC, read back, and
    aggregated per event_type with a pushed-down value filter — the
    read path must preserve types (timestamp included) AND keep the
    columnar virtues (predicate pushdown + column pruning reach the
    OrcScan exactly as they do for parquet; `tests/test_plans.py`
    pins both). Oracle = the same aggregate over the parquet
    fixture."""
    path = _events_orc_dir(spark, sf_dir)
    ev = spark.read.orc(path)
    return (ev.filter(F.col("value") > 50.0)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts")))


_ORC_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events WHERE value > 50.0 GROUP BY event_type
"""


_BINARYFILE_N = 64


def _payload_files_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the first `_BINARYFILE_N` documents as one raw payload
    file each (name = doc_id) — the loose-files layout media corpora
    actually land in before ingestion. Distributed write via
    foreachPartition (each task writes its own files; no driver
    collect)."""
    stage_dir = f"/tmp/bdsm_binfiles{sf_dir.replace('/', '_')}"
    marker = f"{stage_dir}/_STAGED"
    if not os.path.exists(marker):
        os.makedirs(stage_dir, exist_ok=True)
        rows = (load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") < _BINARYFILE_N)
                .select("doc_id", "text"))

        def write_part(it):
            for r in it:
                with open(f"{stage_dir}/{r['doc_id']}.bin", "wb") as f:
                    f.write(r["text"].encode("utf-8"))

        rows.foreachPartition(write_part)
        open(marker, "w").close()
    return stage_dir


def q_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload ingestion through Spark's `binaryFile` source —
    the path multimodal corpora take INTO the engine (one image/audio
    blob per file on object storage → binary rows): read the staged
    payload files, recover the id from the filename, and emit
    (doc_id, n_bytes, payload_md5). The oracle computes the same
    md5/length from the source table, so the round trip proves
    byte-faithful file IO end-to-end.

    Scale notes: binaryFile is a standard FileScan — partition
    planning, maxPartitionBytes, and path filters (`pathGlobFilter`,
    `recursiveFileLookup`) all apply; each task reads whole files, so
    `spark.sql.files.maxPartitionBytes` bounds per-task bytes. The
    md5/length projection drops the payload before anything
    shuffles."""
    path = _payload_files_dir(spark, sf_dir)
    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin").load(path))
    doc_id = F.regexp_extract(
        F.col("path"), r"/(\d+)\.bin$", 1).cast("long")
    return (bf.select(doc_id.alias("doc_id"),
                      F.col("length").alias("n_bytes"),
                      F.md5("content").alias("payload_md5"))
            .orderBy("doc_id"))


_BINARYFILE_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents WHERE doc_id < {_BINARYFILE_N}
ORDER BY doc_id
"""


def _evolved_schema_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage `events` as TWO parquet epochs with different schemas —
    epoch 1 lacks the `quality_score` column a later pipeline version
    added (days 1-15), epoch 2 carries it (rest of the month, score =
    value / 500). The standard long-lived-table situation at scale:
    files written across schema versions live side by side."""
    stage_dir = f"/tmp/bdsm_evolve{sf_dir.replace('/', '_')}"
    marker = f"{stage_dir}/_STAGED"
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        old = ev.filter(F.dayofmonth("ts") <= 15).select(
            "event_id", "ts", "user_id", "event_type", "value")
        new = ev.filter(F.dayofmonth("ts") > 15).select(
            "event_id", "ts", "user_id", "event_type", "value",
            (F.col("value") / 500.0).alias("quality_score"))
        old.write.mode("overwrite").parquet(f"{stage_dir}/epoch=1")
        new.write.mode("overwrite").parquet(f"{stage_dir}/epoch=2")
        open(marker, "w").close()
    return stage_dir


def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a table whose files span two schema versions with
    `mergeSchema=true`: epoch-1 rows surface the late-added
    `quality_score` column as NULL, epoch-2 rows carry real values,
    and one aggregate proves both epochs landed in a single unified
    frame (per event_type: total rows, rows with a score, decimal-
    quantized score sum). The epoch directories double as partition
    columns, so partition pruning still works on the evolved table.

    Scale notes: schema merge is a FOOTER-level operation at planning
    time (Spark samples file footers; `mergeSchema` makes it read all
    of them — at 100 TB you set the union schema explicitly or keep
    it in a metastore, same read path). Rows are never rewritten; the
    missing column materializes as NULL at scan time."""
    path = _evolved_schema_dir(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return (df.groupBy("event_type")
            .agg(F.count("*").alias("n_rows"),
                 F.count("quality_score").alias("n_scored"),
                 F.sum(F.floor(F.col("quality_score") * 1e9)
                       .cast("long")).alias("score_sum_q"))
            .orderBy("event_type"))


_SCHEMA_EVOLUTION_SQL = """
WITH unified AS (
  SELECT event_type,
         CASE WHEN date_part('day', ts) > 15
              THEN value / 500.0 END AS quality_score
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(quality_score) AS BIGINT) AS n_scored,
       CAST(SUM(CAST(floor(quality_score * 1e9) AS BIGINT)) AS BIGINT)
         AS score_sum_q
FROM unified GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "csv_roundtrip": (q_csv_roundtrip, _CSV_ROUNDTRIP_SQL),
    "orc_roundtrip_agg": (q_orc_roundtrip_agg, _ORC_ROUNDTRIP_SQL),
    "binaryfile_ingest": (q_binaryfile_ingest, _BINARYFILE_SQL),
    "schema_evolution_read": (q_schema_evolution_read,
                              _SCHEMA_EVOLUTION_SQL),
}

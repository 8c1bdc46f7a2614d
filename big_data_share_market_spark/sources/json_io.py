"""JSON envelope codec + recursive flatten + UTC normalization
(SURVEY §2.A5/A6, §2.C1-C8).

Reference behaviors re-expressed:

- `flatten_dict` (`kafka_producer/yahoo_finance_producer.py:72-80`):
  nested dict → flat keys joined with `_`. Here it is schema-driven —
  a driver-side recursion over ``df.schema`` emitting one `col("a.b")
  .alias("a_b")` per leaf, so the flatten is a pure projection that
  Catalyst prunes/pushes down (no UDF, no row work).
- producer JSON envelope (`kafka_producer/yahoo_finance_producer.py:
  108-116`): `json.dumps({'symbol': s, **record})` keyed by symbol →
  `to_json(struct(*))` with a `key` column — the exact shape
  `write.format("kafka")` wants.
- Flink JSON source with `'json.ignore-parse-errors' = 'True'`
  (`flink_processor/flink_processor.py:66-73`): `from_json` is
  PERMISSIVE by default — malformed input yields a null struct, which
  `drop_malformed=True` filters, replicating ignore-parse-errors.
- UTC string normalization (`kafka_producer/yahoo_finance_producer.py:
  53-56`) and browser-tz conversion (`streamlit_app/streamlit_app.py:
  341-343`).

Scale notes: everything here is a narrow projection — no shuffle, no
Python row work; stays inside WholeStageCodegen. At 100 TB the flatten
and envelope codec run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table


# ---------------------------------------------------------------------------
# C3: recursive schema flatten (driver-side recursion → one projection)

def flatten(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten all nested struct columns into `parent{sep}child`
    leaves — the schema-driven equivalent of the reference's
    `flatten_dict` (`kafka_producer/yahoo_finance_producer.py:72-80`).

    Driver-side recursion over ``df.schema`` emits one aliased column
    per leaf, so the flatten is a pure projection Catalyst prunes and
    pushes down — no UDF, no row work. Arrays/maps stay leaves (the
    reference only nests dicts); explode is the caller's choice.
    """
    def walk(schema: T.StructType, path: tuple[str, ...]) -> list[Column]:
        out: list[Column] = []
        for field in schema.fields:
            p = path + (field.name,)
            if isinstance(field.dataType, T.StructType):
                out.extend(walk(field.dataType, p))
            else:
                out.append(F.col(".".join(f"`{seg}`" for seg in p))
                           .alias(sep.join(p)))
        return out

    return df.select(*walk(df.schema, ()))


# ---------------------------------------------------------------------------
# A5 / C4: producer envelope — key by symbol, JSON-serialize the record

def encode_envelope(df: DataFrame, key_col: str) -> DataFrame:
    """(key STRING, value STRING) envelope: `to_json(struct(*))` with
    the key column kept separately — the write shape of both
    `write.format("kafka")` and the reference's producer
    (`kafka_producer/yahoo_finance_producer.py:108-116`)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


# ---------------------------------------------------------------------------
# A6 / C5: source-side JSON decode with parse-error tolerance

def decode_envelope(df: DataFrame, schema: T.StructType | str,
                    value_col: str = "value",
                    drop_malformed: bool = True) -> DataFrame:
    """Parse a JSON `value` column back to typed columns. PERMISSIVE
    `from_json` nulls malformed rows; dropping them replicates Flink's
    `'json.ignore-parse-errors' = 'True'`
    (`flink_processor/flink_processor.py:72`)."""
    parsed = df.withColumn("_rec", F.from_json(F.col(value_col).cast("string"),
                                               schema))
    if drop_malformed:
        parsed = parsed.filter(F.col("_rec").isNotNull())
    return parsed.select("_rec.*")


# ---------------------------------------------------------------------------
# C1 / C7: UTC normalization

def utc_string(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Timestamp → canonical UTC string, the producer's normalization
    (`kafka_producer/yahoo_finance_producer.py:53-56`). Session tz is
    pinned to UTC (session.py), so date_format emits UTC wall time."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, fmt)


def in_timezone(col: Column | str, tz: str) -> Column:
    """UTC timestamp → wall-clock in `tz`, the dashboard's browser-tz
    conversion (`streamlit_app/streamlit_app.py:341-343`)."""
    return F.from_utc_timestamp(F.col(col) if isinstance(col, str) else col, tz)


# ---------------------------------------------------------------------------
# Registry queries

_PROPS_SCHEMA = "k INT"


def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 JSON parse over `events.props` → typed extraction + grouped
    agg. `from_json` with an explicit schema keeps the parse inside
    codegen (no Python); at 100 TB this is the canonical
    semi-structured-column pattern."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.from_json("props", _PROPS_SCHEMA)["k"])
        .groupBy("k")
        .agg(F.count("*").alias("n"),
             F.avg("value").alias("avg_value"))
        .orderBy("k")
    )


_PROPS_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS n,
       AVG(value) AS avg_value
FROM events GROUP BY 1 ORDER BY 1
"""


def q_json_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5→A6 end-to-end: encode each event into the keyed JSON envelope
    (producer shape), decode through the PERMISSIVE source path, and
    project the typed record — value-identical to the input, which the
    plain-SELECT oracle certifies."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        utc_string("ts").alias("ts_utc"),
    )
    envelope = encode_envelope(ev, key_col="user_id")
    decoded = decode_envelope(
        envelope,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, ts_utc STRING",
    )
    return decoded


_ROUNDTRIP_SQL = """
SELECT event_id, user_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_utc
FROM events
"""


def q_flatten_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 recursive flatten: build the producer's nested financial-
    record shape (envelope struct with nested sub-structs, like the 20
    yfinance sub-datasets) from `orders`, flatten to `_`-joined leaves.
    The flatten is a pure projection — Catalyst prunes unused leaves."""
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("totalprice"),
            ).alias("detail"),
        ).alias("order"),
    )
    return flatten(nested)


_FLATTEN_SQL = """
SELECT o_orderkey AS orderkey,
       o_custkey AS order_custkey,
       o_orderstatus AS order_detail_status,
       o_totalprice AS order_detail_totalprice
FROM orders
"""


def q_jsonl_corrupt_tolerant_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6's `'json.ignore-parse-errors' = 'True'`
    (`flink_processor/flink_processor.py:72`) against a REAL corrupted
    file: stage the events as JSON-lines with malformed lines
    interleaved (truncated JSON, non-JSON garbage, wrong-type field),
    scan with PERMISSIVE `from_json`, drop the nulls, return the typed
    rows. The oracle certifies the survivors equal the clean fixture
    exactly — garbage neither kills the job nor leaks rows.

    Plan: a text scan + codegen'd from_json + filter; tolerance costs
    zero extra passes. At 100 TB the malformed fraction only wastes
    its own bytes."""
    import os

    stage_dir = f"/tmp/bdsm_jsonl{sf_dir.replace('/', '_')}"
    marker = f"{stage_dir}/garbage.txt"
    if not os.path.exists(marker):
        # Stage distributed (no driver-side collect of the data), then
        # drop a separate file of deterministic garbage into the dir:
        # truncated JSON, bare text, wrong-type field.
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"))
        (ev.select(F.to_json(F.struct("*")).alias("value"))
         .write.mode("overwrite").text(stage_dir))
        with open(marker, "w") as f:
            f.write('{"event_id": 1, "user_id": \n'      # truncated
                    "not json at all\n"
                    '{"event_id": "NaN-ish", "user_id": {}}\n')
    schema = ("event_id BIGINT, user_id BIGINT, event_type STRING, "
              "value DOUBLE, ts_s STRING")
    raw = (spark.read.format("text")
           .option("pathGlobFilter", "{part,garbage}*").load(stage_dir))
    parsed = raw.select(
        F.from_json(F.col("value"), schema,
                    {"mode": "PERMISSIVE"}).alias("rec"))
    return (parsed.filter(F.col("rec").isNotNull()
                          & F.col("rec.event_id").isNotNull())
            .select("rec.event_id", "rec.user_id", "rec.event_type",
                    F.col("rec.value").alias("value"),
                    F.to_timestamp("rec.ts_s",
                                   "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts")))


_JSONL_CORRUPT_SQL = """
SELECT event_id, user_id, event_type, value, ts FROM events
"""


def q_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType end-to-end (the one Spark complex type the other
    queries don't touch): parse `props` as MAP<STRING,INT> without a
    declared struct schema — the schema-free path for JSON objects
    with open key sets — explode the entries, aggregate per key.
    At 100 TB this is the idiomatic shape for sparse attribute bags
    (the declared-schema alternative is q_props_json_extract)."""
    ev = load_table(spark, sf_dir, "events")
    # explode_outer + IS NOT NULL: plain explode infers size()>0 and
    # re-parses the JSON map inside the pushed-down scan filter.
    entries = (ev.select(
        F.explode_outer(F.from_json("props", "MAP<STRING, INT>"))
        .alias("key", "val"))
        .filter(F.col("key").isNotNull()))
    return (entries.groupBy("key")
            .agg(F.count("*").alias("n"),
                 F.sum("val").alias("sum_val"),
                 F.min("val").alias("min_val"),
                 F.max("val").alias("max_val"))
            .orderBy("key"))


_PROPS_MAP_SQL = """
WITH entries AS (
  SELECT unnest(json_keys(props)) AS key,
         CAST(props AS JSON) AS j
  FROM events)
SELECT key, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(j, '$.' || key) AS INTEGER))
            AS BIGINT) AS sum_val,
       MIN(CAST(json_extract(j, '$.' || key) AS INTEGER)) AS min_val,
       MAX(CAST(json_extract(j, '$.' || key) AS INTEGER)) AS max_val
FROM entries GROUP BY key ORDER BY key
"""


def q_nested_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4's array-of-records shape end-to-end: nest each order's lines
    into a sorted ARRAY<STRUCT> (the document form a financial-feed
    record carries, e.g. the yfinance sub-dataset lists), then explode
    back to rows with `inline`. The oracle certifies zero loss either
    direction. Both steps stay columnar — collect_list is one
    map-side-combined aggregate on the key; inline is a generator in
    the same stage as its input."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(F.struct(
            "l_linenumber", "l_quantity", "l_extendedprice"))).alias("lines"))
    )
    return nested.select("l_orderkey", F.inline("lines"))


_NESTED_ARRAY_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
"""


def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-FREE semi-structured access via Spark 4's VARIANT type:
    `try_parse_json` shreds `events.props` into the binary variant
    encoding once, `variant_get` path-extracts without declaring a
    schema up front — the open-schema complement of
    `props_json_extract` (which needs `_PROPS_SCHEMA` at plan time).
    Per event_type: rows, rows where $.k exists, min/max/sum of k.

    Scale notes: parse + extraction are row-local JVM expressions
    (one parse feeding every extraction via the shared subexpression);
    `try_parse_json` maps malformed documents to NULL instead of
    failing the task — the PERMISSIVE contract, here at expression
    granularity. All aggregates are exact integers."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr(
        "CAST(variant_get(try_parse_json(props), '$.k') AS BIGINT)")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.count("k").alias("n_with_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"),
             F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


_VARIANT_PROPS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "props_json_extract": (q_props_json_extract, _PROPS_JSON_SQL),
    "variant_props_stats": (q_variant_props_stats, _VARIANT_PROPS_SQL),
    "json_envelope_roundtrip": (q_json_envelope_roundtrip, _ROUNDTRIP_SQL),
    "flatten_nested": (q_flatten_nested, _FLATTEN_SQL),
    "jsonl_corrupt_tolerant_scan": (q_jsonl_corrupt_tolerant_scan,
                                    _JSONL_CORRUPT_SQL),
    "nested_array_roundtrip": (q_nested_array_roundtrip, _NESTED_ARRAY_SQL),
    "props_map_explode": (q_props_map_explode, _PROPS_MAP_SQL),
}

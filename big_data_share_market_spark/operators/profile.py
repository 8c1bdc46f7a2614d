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


def q_missing_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series completeness report: per key, how many hourly bar
    slots between its first and last bar are EMPTY — the gap audit a
    feed-health monitor runs (a missing bar means the upstream
    producer or ingest dropped an interval). Expected slot count is
    computed arithmetically from the per-key min/max (no calendar
    explode); actual bars are one count — a single aggregate pass
    over the bars, no joins. At 100 TB this is two cascaded
    aggregations on the same key."""
    from .transforms import ohlc_bars
    bars = ohlc_bars(spark, sf_dir)
    per_key = (bars.groupBy("user_id")
               .agg(F.min("bar_ts").alias("first_bar"),
                    F.max("bar_ts").alias("last_bar"),
                    F.count("*").alias("n_bars")))
    expected = (
        (F.unix_timestamp("last_bar") - F.unix_timestamp("first_bar"))
        / 3600 + 1).cast("long")
    return (per_key
            .withColumn("n_expected", expected)
            .withColumn("n_missing", F.col("n_expected") - F.col("n_bars"))
            .withColumn("completeness",
                        F.col("n_bars") / F.col("n_expected").cast("double"))
            .select("user_id", "first_bar", "last_bar", "n_bars",
                    "n_expected", "n_missing", "completeness")
            .orderBy("user_id"))


_MISSING_BARS_SQL = """
WITH bars AS (
  SELECT user_id, date_trunc('hour', ts) AS bar_ts
  FROM events GROUP BY user_id, date_trunc('hour', ts)),
per_key AS (
  SELECT user_id, MIN(bar_ts) AS first_bar, MAX(bar_ts) AS last_bar,
         COUNT(*) AS n_bars
  FROM bars GROUP BY user_id)
SELECT user_id, first_bar, last_bar, n_bars,
       CAST(date_diff('hour', first_bar, last_bar) + 1 AS BIGINT)
         AS n_expected,
       CAST(date_diff('hour', first_bar, last_bar) + 1 - n_bars AS BIGINT)
         AS n_missing,
       CAST(n_bars AS DOUBLE)
         / (date_diff('hour', first_bar, last_bar) + 1) AS completeness
FROM per_key
ORDER BY user_id
"""


def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week return seasonality: decimal-exact mean of the
    quantized daily returns per weekday, across all keys — the
    calendar-effect screen every systematic desk runs. One narrow
    projection + one 7-group aggregate; scale cost is the daily-return
    build it shares with corr_pairs."""
    from .finance import _Q, _daily_rets
    rets = _daily_rets(spark, sf_dir)
    return (rets
            .withColumn("dow", F.dayofweek("day_ts"))
            .groupBy("dow")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.col("ret_i").cast("decimal(38,0)"))
                  .cast("double") / F.count("*") / _Q).alias("mean_ret"))
            .orderBy("dow"))


def _dow_sql() -> str:
    from .finance import _Q, _DAILY_RETS_CTE
    return f"""
WITH {_DAILY_RETS_CTE.strip()}
SELECT dayofweek(day_ts) + 1 AS dow, COUNT(*) AS n,
       CAST(CAST(SUM(ret_i) AS VARCHAR) AS DOUBLE) / COUNT(*) / {_Q}
         AS mean_ret
FROM drets
GROUP BY dayofweek(day_ts)
ORDER BY dow
"""


#: The data contract: (column, max allowed null fraction, declared
#: numeric [lo, hi] or None for non-numeric). In a real pipeline this
#: is a table loaded from the contract store — the literal rows model
#: that artifact, and the checks treat it as DATA (cf. the
#: quality-classifier weight table): tightening a bound is a contract
#: edit, not a query edit.
_CONTRACT = (
    ("l_orderkey", 0.0, (0.0, 1e9)),
    ("l_quantity", 0.0, (1.0, 50.0)),
    ("l_extendedprice", 0.0, (0.0, 1e7)),
    ("l_discount", 0.0, (0.0, 0.10)),
    ("l_tax", 0.0, (0.0, 0.08)),
    ("l_returnflag", 0.0, None),
    ("l_shipdate", 0.0, None),
)


def q_contract_check_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation — the PASS/FAIL judgment layer on top
    of the raw profile (`dq_profile_lineitem` measures; this decides):
    per contracted column, the observed null fraction against the
    declared maximum and the observed numeric range against the
    declared [lo, hi], plus the verdict booleans a CI gate consumes.

    Scale shape: identical to the profile — ONE aggregate pass
    computes every column's facts simultaneously (constant aggregate
    state), the contract rides as literals into row-local comparisons
    in the exploded one-row result. Violations cost the same as
    passes; at 100 TB this is one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, _mnf, rng in _CONTRACT:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .alias(f"{col}__nulls"))
        if rng is not None:
            aggs += [F.min(col).cast("double").alias(f"{col}__min"),
                     F.max(col).cast("double").alias(f"{col}__max")]
    one = li.agg(*aggs)
    # Output carries NO NULL cells by design: a numeric-NULL column
    # round-trips as None in Spark but NaN through pandas on the
    # oracle side, which the driver's value compare cannot unify —
    # NaN itself normalizes identically in both harnesses, so it is
    # the sentinel for the non-applicable bounds; non-numeric columns
    # get a vacuous range_ok = TRUE.
    structs = []
    for col, max_null_frac, rng in _CONTRACT:
        null_frac = (F.col(f"{col}__nulls").cast("double")
                     / F.col("n_rows").cast("double"))
        nulls_ok = null_frac <= F.lit(max_null_frac)
        if rng is not None:
            lo, hi = rng
            range_ok = ((F.col(f"{col}__min") >= F.lit(lo))
                        & (F.col(f"{col}__max") <= F.lit(hi)))
            omin = F.col(f"{col}__min")
            omax = F.col(f"{col}__max")
        else:
            range_ok = F.lit(True)
            omin = F.lit(float("nan"))
            omax = F.lit(float("nan"))
        structs.append(F.struct(
            F.lit(col).alias("column"),
            null_frac.alias("null_frac"),
            nulls_ok.alias("nulls_ok"),
            omin.alias("observed_min"),
            omax.alias("observed_max"),
            range_ok.alias("range_ok"),
            (nulls_ok & range_ok).alias("passes"),
        ))
    return (one.select(F.explode(F.array(*structs)).alias("c"))
            .select("c.*").orderBy("column"))


def _contract_branch_sql(col: str, max_null_frac: float, rng) -> str:
    null_frac = (f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
                 f" AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")
    nulls_ok = f"({null_frac}) <= {max_null_frac}"
    if rng is not None:
        lo, hi = rng
        omin = f"CAST(MIN({col}) AS DOUBLE)"
        omax = f"CAST(MAX({col}) AS DOUBLE)"
        range_ok = f"({omin} >= {lo} AND {omax} <= {hi})"
        passes = f"({nulls_ok}) AND ({range_ok})"
    else:
        omin = omax = "CAST('NaN' AS DOUBLE)"
        range_ok = "TRUE"
        passes = f"({nulls_ok})"
    return f"""
  SELECT '{col}' AS "column", {null_frac} AS null_frac,
         {nulls_ok} AS nulls_ok,
         {omin} AS observed_min, {omax} AS observed_max,
         {range_ok} AS range_ok, {passes} AS passes
  FROM lineitem"""


_CONTRACT_SQL = (
    "SELECT * FROM (\n"
    + "\n  UNION ALL\n".join(
        _contract_branch_sql(c, mnf, rng) for c, mnf, rng in _CONTRACT)
    + ')\nORDER BY "column"'
)


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit before a behavioral table is
    shared or trained on: group events by the quasi-identifier tuple
    (event_type, hour-of-day), then report the equivalence-class size
    distribution as a log10 histogram — n_classes and n_rows per
    size decade, the share of rows living in classes below k = 5,
    and each decade's smallest class. Rows in small classes are the
    linkage-attack surface; the histogram is what a privacy review
    actually reads. Two grouped aggregations, the second over the
    class relation (classes-sized, not rows-sized)."""
    ev = load_table(spark, sf_dir, "events")
    classes = (ev.groupBy("event_type", F.hour("ts").alias("qi_hour"))
               .agg(F.count("*").alias("k")))
    bucket = F.floor(F.log10(F.col("k").cast("double"))).cast("int")
    return (classes
            .groupBy(bucket.alias("k_decade"))
            .agg(F.count("*").alias("n_classes"),
                 F.sum("k").alias("n_rows"),
                 F.min("k").alias("min_k"),
                 F.sum(F.when(F.col("k") < 5, F.col("k"))
                       .otherwise(F.lit(0))).alias("rows_below_k5"))
            .orderBy("k_decade"))


_K_ANON_SQL = """
WITH classes AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS qi_hour, COUNT(*) AS k
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts))
SELECT CAST(floor(log10(CAST(k AS DOUBLE))) AS INTEGER) AS k_decade,
       COUNT(*) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       MIN(k) AS min_k,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS rows_below_k5
FROM classes
GROUP BY floor(log10(CAST(k AS DOUBLE)))
ORDER BY k_decade
"""


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity — the audit k-anonymity misses: a class can be
    large (k high) yet reveal everything if all its rows share one
    SENSITIVE value (homogeneity attack, Machanavajjhala et al. 2007,
    public). Same quasi-identifier classes as q_k_anonymity_audit
    ((event_type, hour)); sensitive attribute = user_id. Per class,
    l = COUNT(DISTINCT user_id); report the class-size-decade
    histogram of l: n_classes, rows, min l per decade, and the rows
    living in classes with l < 3 (the quarantine set a release gate
    would block). Two grouped aggregations; the distinct count rides
    the same shuffle as the class rollup."""
    ev = load_table(spark, sf_dir, "events")
    classes = (ev.groupBy("event_type", F.hour("ts").alias("qi_hour"))
               .agg(F.count("*").alias("k"),
                    F.countDistinct("user_id").alias("l")))
    decade = F.floor(F.log10(F.col("l").cast("double"))).cast("int")
    return (classes
            .groupBy(decade.alias("l_decade"))
            .agg(F.count("*").alias("n_classes"),
                 F.sum("k").alias("n_rows"),
                 F.min("l").alias("min_l"),
                 F.sum(F.when(F.col("l") < 3, F.col("k"))
                       .otherwise(F.lit(0))).alias("rows_below_l3"))
            .orderBy("l_decade"))


_L_DIVERSITY_SQL = """
WITH classes AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS qi_hour,
         COUNT(*) AS k, COUNT(DISTINCT user_id) AS l
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts))
SELECT CAST(floor(log10(CAST(l AS DOUBLE))) AS INTEGER) AS l_decade,
       COUNT(*) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       MIN(l) AS min_l,
       CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
         AS rows_below_l3
FROM classes
GROUP BY floor(log10(CAST(l AS DOUBLE)))
ORDER BY l_decade
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit (orphaned foreign keys per relationship)
# ---------------------------------------------------------------------------

#: (child table, fk column, parent table, pk column) — the star
#: schema's FK graph.
_FK_RELS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's six FK
    relationships: per relationship, the child row count, the count
    of ORPHANS (child rows whose FK value — NULLs included, since a
    NULL FK is as unjoinable as a dangling one — has no parent), and
    the orphan rate. The trust gate a warehouse runs on every drop
    BEFORE joins silently shrink: an inner join drops orphans without
    a trace, so at 100 TB a 0.1% orphan rate is revenue quietly
    missing from every downstream aggregate.

    Scale shape (r9 verdict item: ONE scan per child, however many
    relationships hang off it): relationships are grouped by child
    table; each child is scanned ONCE, column-pruned to its FK
    columns, LEFT-joined to each parent's deduped key set as a
    membership flag (Catalyst broadcasts the small parents —
    nation/supplier/part at low SF — and sort-merges the fact-sized
    orders side), and a single aggregate emits n_child plus one
    conditional orphan count per relationship; `stack` unpivots the
    one-row summary into per-relationship rows (row-local). The naive
    form scanned each child once per relationship (lineitem: 2 aggs ×
    3 relationships = 6 lineitem scans); this form reads lineitem
    once — pinned in tests/test_plans.py. A NULL FK never matches the
    membership join, so NULLs count as orphans, exactly like the
    NOT-EXISTS oracle."""
    by_child: dict[str, list] = {}
    for child, fk, parent, pk in _FK_RELS:
        by_child.setdefault(child, []).append((fk, parent, pk))
    out = None
    for child, rels in by_child.items():
        j = load_table(spark, sf_dir, child).select(
            *[F.col(fk) for fk, _, _ in rels])
        for i, (fk, parent, pk) in enumerate(rels):
            p = (load_table(spark, sf_dir, parent)
                 .select(F.col(pk).alias(f"__pk{i}")).distinct())
            j = j.join(p, F.col(fk) == F.col(f"__pk{i}"), "left")
        summary = j.agg(
            F.count("*").alias("n_child"),
            *[F.count(F.when(F.col(f"__pk{i}").isNull(), 1))
              .alias(f"o{i}") for i in range(len(rels))])
        stack_args = ", ".join(
            f"'{child}.{fk} -> {parent}.{pk}', o{i}"
            for i, (fk, parent, pk) in enumerate(rels))
        rows = (summary.select(
                    F.expr(f"stack({len(rels)}, {stack_args})"
                           " AS (relationship, n_orphans)"),
                    "n_child")
                .select("relationship", "n_child", "n_orphans",
                        F.expr("CAST(n_orphans AS DOUBLE)"
                               " / CAST(n_child AS DOUBLE)")
                        .alias("orphan_rate")))
        out = rows if out is None else out.unionAll(rows)
    return out.orderBy("relationship")


def _fk_branch_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
  SELECT '{child}.{fk} -> {parent}.{pk}' AS relationship,
         (SELECT COUNT(*) FROM {child}) AS n_child,
         (SELECT COUNT(*) FROM {child} c
          WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                            WHERE p.{pk} = c.{fk})) AS n_orphans,
         CAST((SELECT COUNT(*) FROM {child} c
               WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                 WHERE p.{pk} = c.{fk})) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM {child}) AS DOUBLE)
           AS orphan_rate"""


_FK_AUDIT_SQL = (
    "SELECT * FROM (\n"
    + "\n  UNION ALL\n".join(_fk_branch_sql(*rel) for rel in _FK_RELS)
    + ")\nORDER BY relationship"
)


# ---------------------------------------------------------------------------
# Benford first-digit conformity (fabricated/corrupted-feed screen)
# ---------------------------------------------------------------------------

#: Benford expected P(first digit = d) = log10(1 + 1/d), emitted as
#: the SAME Python-repr double literals in both engines (a runtime
#: log10 could differ by 1 ulp between libm and the JVM; a shared
#: decimal literal parses identically everywhere).
import math as _math

_BENFORD_CASE = ("CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({_math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
    for d in range(1, 10)) + " END")

#: Per-digit z-score of observed vs Benford proportion under the
#: normal approximation to the binomial — one expression text, both
#: engines (single-row float math, no cross-row float sums).
_BENFORD_Z = ("(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)"
              " - p_benford)"
              " / sqrt(p_benford * (CAST(1.0 AS DOUBLE) - p_benford)"
              "        / CAST(n_total AS DOUBLE))")


def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformity of
    lineitem.l_extendedprice — the classic fabricated-data /
    corrupted-feed screen (prices spanning several orders of
    magnitude should be Benford-distributed; a truncated feed, a
    unit-mix bug, or synthetic padding shows up as digit-1/digit-9
    excess long before any row-level rule fires). Nine rows out:
    per digit, the exact observed count, observed vs expected
    proportion, and the binomial z-score.

    Cross-engine exactness: the first digit comes from the CANONICAL
    integer-to-string rendering of the exact cent value
    (round(price × 100) → BIGINT — the explicit round() because the
    column is DOUBLE and a bare CAST truncates in Spark but rounds in
    DuckDB; 2-decimal prices never land near .5 in binary, so both
    round()s agree — no float formatting anywhere); expected
    proportions are shared literals; z is single-row arithmetic with
    identical text. No cross-row float sum exists, so no
    accumulation-order hazard — which is why the output is the
    9-row digit table rather than a chi-square scalar.

    Scale shape: one row-local digit projection, one 9-group
    map-side-combined count, one broadcast of the 1-row total.
    100 TB cost = one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    digits = (li.select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
        .alias("cents"))
        .filter(F.col("cents") > 0)
        .select(F.expr(
            "CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)")
            .alias("digit")))
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("p_benford", F.expr(_BENFORD_CASE))
            .withColumn("p_obs", F.expr(
                "CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)"))
            .withColumn("z", F.expr(_BENFORD_Z))
            .select("digit", "n_obs", "n_total", "p_obs", "p_benford", "z")
            .orderBy("digit"))


_BENFORD_SQL = f"""
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
d AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
  FROM c WHERE cents > 0),
g AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM g),
j AS (
  SELECT digit, n_obs, n_total, {_BENFORD_CASE} AS p_benford
  FROM g CROSS JOIN t)
SELECT digit, n_obs, n_total,
       CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_obs,
       p_benford,
       {_BENFORD_Z} AS z
FROM j
ORDER BY digit
"""


QUERIES = {
    "k_anonymity_audit": (q_k_anonymity_audit, _K_ANON_SQL),
    "benford_prices": (q_benford_prices, _BENFORD_SQL),
    "fk_integrity_audit": (q_fk_integrity_audit, _FK_AUDIT_SQL),
    "l_diversity_audit": (q_l_diversity_audit, _L_DIVERSITY_SQL),
    "contract_check_lineitem": (q_contract_check_lineitem, _CONTRACT_SQL),
    "dq_profile_lineitem": (q_dq_profile_lineitem, _DQ_PROFILE_SQL),
    "missing_bars": (q_missing_bars, _MISSING_BARS_SQL),
    "dow_seasonality": (q_dow_seasonality, _dow_sql()),
}

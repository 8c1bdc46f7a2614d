"""Python user-defined table functions (Spark 4 UDTF API): per-key
sequential operators callable from SQL.

Beyond the reference (its per-symbol sequential logic lives in a
pandas dashboard thread, `streamlit_app/provider.py:107-113`) — this
module shows the THIRD way to package a custom per-key operator in
this engine, next to the Arrow kernels (`operators/ewm._apply_ewm`)
and the streaming state machines (`streaming/state.py`): a Python
UDTF invoked as `FROM op(TABLE(...) PARTITION BY k ORDER BY ts)`.
The planner hash-partitions the input on the PARTITION BY key and
sorts each group by the ORDER BY clause, then streams the rows
through `eval()` with a `terminate()` call at each group boundary —
i.e. Spark gives the UDTF exactly the (shuffle + sort) contract a
sessionizer needs, and the operator composes in SQL like any table.

`udtf_sessionize` is a deliberate A/B/C: the SAME gaps-and-islands
session semantics (4 h inactivity gap) are implemented three ways —
built-in `F.session_window` aggregation (`stream_session_windows`),
a timeout-driven `applyInPandasWithState` state machine
(`stream_session_timeout`), and this UDTF — and all three carry the
same oracle shape, so the engines' agreement certifies each
implementation against the others.

Scale notes: one shuffle (hash on user_id) + per-partition sort —
identical exchange shape to the window-function formulation. State
per group is one open session (5 scalars); output is sessions, not
events. Row-at-a-time Python `eval` is the cost — acceptable here
because sessions collapse the stream; for a hot path the Arrow
kernel form (`ewm.py`) is the fast lane.

Float discipline: per-event values are quantized to exact integer
1e-6 units (`CAST(value AS DECIMAL(25,6)) * 1000000 → BIGINT`)
BEFORE the UDTF, summed as Python ints (exact, order-free), and
divided back to DOUBLE once per session — the same cross-engine
trick as `functions.dsum`.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table

#: Inactivity gap: a new session starts where the gap from the
#: previous event is >= this (matches `stream_session_windows`).
_GAP = dt.timedelta(hours=4)


class _SessionizeUDTF:
    """Gaps-and-islands sessionizer. Rows arrive per (PARTITION BY
    user_id) group in (ORDER BY ts, event_id) order; closed sessions
    are emitted from `eval` as soon as a later event proves the gap,
    and `terminate` flushes the final open session at the group
    boundary."""

    def __init__(self) -> None:
        self._user = None
        self._start = None
        self._last = None
        self._n = 0
        self._sum_u6 = 0

    def _flush(self):
        yield (self._user, self._start, self._last + _GAP,
               self._n, self._sum_u6)

    def eval(self, row):
        # TABLE arguments arrive as one Row per input row.
        user_id, ts, value_u6 = row["user_id"], row["ts"], row["value_u6"]
        if self._n and ts - self._last >= _GAP:
            yield from self._flush()
            self._n = 0
            self._sum_u6 = 0
        if self._n == 0:
            self._user = user_id
            self._start = ts
        self._last = ts
        self._n += 1
        self._sum_u6 += value_u6

    def terminate(self):
        if self._n:
            yield from self._flush()


_SESSION_DDL = ("user_id BIGINT, session_start TIMESTAMP, "
                "session_end TIMESTAMP, n_events BIGINT, sum_u6 BIGINT")


def q_udtf_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (4 h inactivity gap) as a Python UDTF over
    `TABLE(events) PARTITION BY user_id ORDER BY ts` — session_end =
    last event + gap, mirroring `F.session_window`'s end convention
    and `stream_session_windows`' oracle."""
    from pyspark.sql.functions import udtf

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "udtf_events_src")
    spark.udtf.register(
        "sessionize_udtf", udtf(_SessionizeUDTF, returnType=_SESSION_DDL))
    return spark.sql("""
        SELECT user_id, session_start, session_end, n_events,
               CAST(sum_u6 AS DOUBLE) / 1000000.0 AS sum_value
        FROM sessionize_udtf(
          TABLE(
            SELECT user_id, ts, event_id,
                   CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)
                     AS value_u6
            FROM udtf_events_src)
          PARTITION BY user_id ORDER BY (ts, event_id))
        ORDER BY user_id, session_start
    """)


_UDTF_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS value_u6,
         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 4 HOUR
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
islands AS (
  -- ORDER BY (ts, event_id) — the SAME total order new_session was
  -- computed over — so session ids stay deterministic even with
  -- duplicate (user_id, ts) rows (peer order would otherwise be
  -- engine-arbitrary).
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 4 HOUR AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(value_u6) AS DOUBLE) / 1000000.0 AS sum_value
FROM islands GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_udtf_sessionize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sessionizer registered with `useArrow=True` (Spark
    4's Arrow-optimized UDTF serializer) — the A/B twin of
    `q_udtf_sessionize`, same class, same SQL text, same oracle.
    `eval` is still invoked once per row (the UDTF contract is
    row-wise regardless of serializer), so Arrow buys batched
    JVM↔Python TRANSFER, not vectorized eval: the A/B isolates how
    much of the row-UDTF lane's cost is serialization vs Python
    dispatch.

    MEASURED OUTCOME (r8, sf0.1, local[32]): ~2.8× SLOWER than the
    row-pickling UDTF (20.7 s vs 7.4 s) — with a generator `eval`
    yielding one small tuple per session, Spark 4.1's Arrow UDTF
    serializer pays per-call Arrow conversion overhead that dwarfs
    the pickle savings. Recorded in BENCH_NOTES; excluded from the
    bench HEADLINE (this query exists to record the finding). The
    Arrow kernel `ewm.py` lane remains the production path for
    per-key sequential logic either way."""
    from pyspark.sql.functions import udtf

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "udtf_events_src_arrow")
    spark.udtf.register(
        "sessionize_udtf_arrow",
        udtf(_SessionizeUDTF, returnType=_SESSION_DDL, useArrow=True))
    return spark.sql("""
        SELECT user_id, session_start, session_end, n_events,
               CAST(sum_u6 AS DOUBLE) / 1000000.0 AS sum_value
        FROM sessionize_udtf_arrow(
          TABLE(
            SELECT user_id, ts, event_id,
                   CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)
                     AS value_u6
            FROM udtf_events_src_arrow)
          PARTITION BY user_id ORDER BY (ts, event_id))
        ORDER BY user_id, session_start
    """)


QUERIES = {
    "udtf_sessionize": (q_udtf_sessionize, _UDTF_SESSION_SQL),
    "udtf_sessionize_arrow": (q_udtf_sessionize_arrow, _UDTF_SESSION_SQL),
}

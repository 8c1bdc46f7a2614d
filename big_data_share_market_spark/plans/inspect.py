"""Capture `df.explain(...)` output for assertions (see
tests/test_plans.py)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text `df.explain(mode)` prints. Planning only — nothing
    executes (with AQE the string shows the initial plan; the
    properties asserted in tests are decided at planning time)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def scan_read_schemas(df: DataFrame) -> dict[str, str]:
    """table-file -> ReadSchema struct string for every parquet scan in
    the plan; proves column pruning reached the scan."""
    text = explain_str(df, "formatted")
    out: dict[str, str] = {}
    loc, schema = None, None
    for line in text.splitlines():
        m = re.search(r"Location:.*\[([^\]]*)\]", line)
        if m:
            loc = m.group(1).rsplit("/", 1)[-1]
        m = re.search(r"ReadSchema:\s*(\S+)", line)
        if m and loc:
            out[loc] = m.group(1)
            loc = None
    return out

#!/usr/bin/env python
"""Generate PLANS_SUMMARY.md: one row of physical-plan statistics per
registry query (exchanges, join strategies, Python kernels, generates,
staged-relation reads) at sf0.001 — the whole-registry companion to
PLANS.md's per-query narratives and tests/test_plans.py's mechanical
pins. Streaming queries execute on build, so they are listed but not
plan-inspected (their physics is covered by their oracle tests).

Usage: python tools/plan_report.py [> PLANS_SUMMARY.md is written
in-place by default]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_share_market_spark.plans import explain_str  # noqa: E402
from big_data_share_market_spark.registry import all_queries  # noqa: E402
from big_data_share_market_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

COUNTERS = (
    ("exch", r"Exchange hashpartitioning|Exchange rangepartitioning"),
    ("bcast", r"BroadcastExchange"),
    ("smj", r"SortMergeJoin"),
    ("bhj", r"BroadcastHashJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("pykernel", r"MapInPandas|FlatMapGroupsInPandas"),
    ("gen", r"Generate "),
    ("staged", r"InMemoryTableScan"),
    ("topk", r"TakeOrderedAndProject"),
)

_DEPTH = re.compile(r"^[ :+-]*")


def split_staged_subtrees(plan: str) -> tuple[str, dict[str, str]]:
    """Split a simple-explain plan into (main tree, staged subtrees).

    Spark's textual explain INLINES the full cached plan under every
    `InMemoryRelation` reference, so a query that reads a persisted
    relation k times textually repeats its build subtree k times —
    which made PLANS_SUMMARY rows for staged-heavy queries (e.g.
    part_triangles) read like 496 exchanges when the runtime plan
    builds the cache once and reuses one InMemoryTableScan. This
    prunes every InMemoryRelation's child subtree from the main tree
    and returns each DISTINCT staged subtree exactly once (keyed on
    the exact relation header text — the same cached relation prints
    the same expression ids at every reference within one plan, while
    distinct relations sharing column names differ in ids), matching
    the executed shape: main tree + one build per staged relation.
    Dedup recurses into captured build subtrees, so a cached relation
    referenced from inside ANOTHER cached relation's build is also
    counted once (review fix r7).
    """
    # Pass 1 — drop every `== Initial Plan ==` section: executed
    # AdaptiveSparkPlans (cache materialisations run before explain)
    # print BOTH the final and the pre-AQE initial tree; only the
    # final one executed.
    stripped: list[str] = []
    lines = plan.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        depth = _DEPTH.match(line).end()
        if line[depth:].startswith("== Initial Plan =="):
            # The section's first child is printed at the SAME column
            # as the '==', so the section ends at the first line that
            # is strictly shallower.
            j = i + 1
            while j < len(lines):
                d2 = _DEPTH.match(lines[j]).end()
                if d2 < depth or d2 >= len(lines[j]):
                    break
                j += 1
            i = j
            continue
        stripped.append(line)
        i += 1

    # Pass 2 — dedupe InMemoryRelation build subtrees, recursively:
    # a body captured for a new relation is itself deduped, so nested
    # cached references inside it collapse into the same dict.
    subtrees: dict[str, str] = {}

    def dedupe(lines: list[str]) -> list[str]:
        main: list[str] = []
        i = 0
        while i < len(lines):
            line = lines[i]
            depth = _DEPTH.match(line).end()
            if line[depth:].startswith("InMemoryRelation"):
                j = i + 1
                body: list[str] = []
                while j < len(lines):
                    d2 = _DEPTH.match(lines[j]).end()
                    if d2 <= depth or d2 >= len(lines[j]):
                        break
                    body.append(lines[j])
                    j += 1
                key = line[depth:]
                if key not in subtrees:
                    subtrees[key] = ""  # claim before recursing (cycles)
                    subtrees[key] = "\n".join(dedupe(body))
                main.append(line)
                i = j
            else:
                main.append(line)
                i += 1
        return main

    return "\n".join(dedupe(stripped)), subtrees


def count_plan(plan: str) -> dict[str, int]:
    """COUNTERS over the executed shape: the reuse-pruned main tree
    plus each distinct staged subtree once (see split_staged_subtrees).
    """
    main, subtrees = split_staged_subtrees(plan)
    texts = [main, *subtrees.values()]
    return {k: sum(len(re.findall(p, t)) for t in texts)
            for k, p in COUNTERS}


def main() -> None:
    spark = get_spark(app_name="plan-report", cpus="8")
    rows = []
    for name, (fn, sql) in sorted(all_queries().items()):
        if name.startswith("stream_"):
            rows.append((name, None, "streaming (oracle-tested, not "
                                     "plan-built here)", sql is not None))
            continue
        try:
            plan = explain_str(fn(spark, SF_DIR), "simple")
        except Exception as exc:  # pragma: no cover - report, don't die
            rows.append((name, None, f"ERROR {type(exc).__name__}",
                         sql is not None))
            continue
        counts = count_plan(plan)
        rows.append((name, counts, None, sql is not None))

    out = ["# PLANS_SUMMARY — physical-plan statistics per registry query",
           "",
           "Generated by `tools/plan_report.py` at sf0.001. Columns:",
           "hash/range exchanges, broadcast exchanges, sort-merge joins,",
           "broadcast-hash joins, broadcast-nested-loop joins (allowlisted",
           "tiny-side shapes only — see tests/test_plans.py::_BNLJ_OK),",
           "Python Arrow kernels, generates (explodes), staged-relation",
           "reads, top-k operators. `oracle` = has a DuckDB value oracle.",
           "Counts reflect the EXECUTED shape: every InMemoryRelation's",
           "inlined build subtree is counted once per distinct staged",
           "relation, not once per textual reference (Spark reuses the",
           "materialised cache at runtime).",
           "",
           "| query | exch | bcast | smj | bhj | bnlj | kernels | gen |"
           " staged | topk | oracle |",
           "|---|---|---|---|---|---|---|---|---|---|---|"]
    for name, counts, note, has_oracle in rows:
        if counts is None:
            out.append(f"| `{name}` | {note} ||||||||| "
                       f"{'yes' if has_oracle else 'rows-only'} |")
        else:
            c = counts
            out.append(
                f"| `{name}` | {c['exch']} | {c['bcast']} | {c['smj']} |"
                f" {c['bhj']} | {c['bnlj']} | {c['pykernel']} | {c['gen']} |"
                f" {c['staged']} | {c['topk']} |"
                f" {'yes' if has_oracle else 'rows-only'} |")
    n_batch = sum(1 for _, c, _, _ in rows if c is not None)
    out.append("")
    out.append(f"{len(rows)} queries ({n_batch} batch plans inspected).")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS_SUMMARY.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()

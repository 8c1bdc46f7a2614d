"""Physical-plan inspection helpers.

The engine's scale contract (SURVEY §4) is enforceable, not
aspirational: tests assert that dimension joins broadcast, filters and
column pruning reach the parquet scan, top-k compiles to
TakeOrderedAndProject, and nothing silently degenerates into a
cartesian product. These helpers expose the plan as a string the same
way `df.explain()` renders it.
"""

from .inspect import explain_str, scan_read_schemas

__all__ = ["explain_str", "scan_read_schemas"]

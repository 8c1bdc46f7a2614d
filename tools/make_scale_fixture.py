#!/usr/bin/env python
"""Build a larger-scale fixture by key-shifted replication of an
existing one (default: 10x /root/testdata/sf0.1 -> /tmp/bdsm_sf1.0,
i.e. lineitem 6 M rows, events 1 M, documents 50 k, embeddings 20 k).

Replication preserves the semantics every headline query relies on:

- region/nation are REAL dimensions (5/25 rows) and stay fixed.
- customer/supplier/part/orders/lineitem/events replicate with all
  PK/FK columns shifted consistently per replica, so referential
  integrity and join selectivities are preserved while key
  cardinality scales 10x (the realistic scale-up: more customers,
  not fatter ones).
- documents: doc_id shifts; every 7th word (offset = replica) is
  replaced with a replica-specific token, so within-replica near-dup
  structure survives (both members of a pair get the same
  replacements) while cross-replica copies fall far below the 0.8
  Jaccard threshold — the dup rate scales linearly, not
  quadratically.
- embeddings: vec_id shifts; each replica's vectors are rolled by
  `replica` dimensions — an isometry, so within-replica geometry
  (pairwise cosines, bucket structure) is exactly preserved while
  cross-replica similarity decorrelates.

Row groups are capped at 128 k rows so scans can actually split —
the single-row-group artifact of the driver fixtures is documented in
SCALING.md; a deliberately multi-group layout is the honest way to
measure scan parallelism at this size.

Usage: python tools/make_scale_fixture.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES_FIXED = ("region", "nation")
SHIFTS = {
    # table -> {column: offset_unit}; per replica r the column gets
    # r * offset_unit added. Offsets are powers of 10 above the max
    # key in sf0.1 so replica key ranges never collide.
    "customer": {"c_custkey": 10**6},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**6},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**6,
                 "l_suppkey": 10**6},
    "events": {"event_id": 10**8, "user_id": 10**6},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
}
ROW_GROUP = 128 * 1024


def _shift(table: pa.Table, shifts: dict[str, int], r: int) -> pa.Table:
    for col, unit in shifts.items():
        idx = table.schema.get_field_index(col)
        arr = table.column(idx)
        typ = arr.type
        shifted = pa.chunked_array([
            pa.compute.add(c, pa.scalar(r * unit, type=typ))
            for c in arr.chunks])
        table = table.set_column(idx, table.schema.field(idx), shifted)
    return table


def _perturb_text(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    idx = table.schema.get_field_index("text")
    texts = table.column(idx).to_pylist()
    out = []
    for t in texts:
        words = t.split()
        for i in range(r % 7, len(words), 7):
            words[i] = f"w{r}x{i}"
        out.append(" ".join(words))
    return table.set_column(idx, table.schema.field(idx),
                            pa.array(out, type=table.schema.field(idx).type))


def _roll_embeddings(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    idx = table.schema.get_field_index("embedding")
    field = table.schema.field(idx)
    vecs = table.column(idx).to_pylist()
    rolled = [list(np.roll(np.array(v, dtype=np.float32), r)) for v in vecs]
    return table.set_column(idx, field, pa.array(rolled, type=field.type))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdsm_sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in TABLES_FIXED:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")
        print(f"{name}: copied")
    for name, shifts in SHIFTS.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        replicas = []
        for r in range(factor):
            t = _shift(base, shifts, r)
            if name == "documents":
                t = _perturb_text(t, r)
            elif name == "embeddings":
                t = _roll_embeddings(t, r)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=ROW_GROUP)
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()

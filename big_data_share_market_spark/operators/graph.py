"""Iterative graph analytics over a derived co-purchase graph:
fixed-iteration PageRank expressed as repeated DataFrame join+agg.

Beyond the reference (whose only graph-adjacent op is the pairwise
dedup component grouping, see dedup.q_dedup_components) — this is the
iterative-algorithm shape a Spark engine must support: a loop that
re-joins a small per-node state relation against a large, STAGED edge
relation.

Graph: parts that co-occur in the same order (lineitem self-joined on
l_orderkey), as in market-basket co-view graphs. Edges are symmetric
and distinct, so every node has outdegree >= 1 — no dangling-mass
redistribution term is needed (the standard simplification when the
graph is an undirected co-occurrence graph).

Scale shape:
* Edge construction self-joins lineitem on its ORDER key — fanout is
  bounded by order size (TPC-H orders hold <= 7 lines), never by part
  popularity, so there is no skew-key quadratic blowup; the distinct
  collapses multi-edges with one shuffle.
* The graph is staged ONCE in ADJACENCY-LIST form (one row per node:
  dsts array + outdeg, persisted MEMORY_AND_DISK, keyed per
  SparkContext+sf_dir like the staged shingle/token corpora): five
  iterations re-read it, and Spark re-executes unpersisted subtrees
  per reference.
* Each iteration joins two NODES-sized relations (ranks × adjacency)
  and only then explodes contributions straight into their groupBy
  exchange — the |E| rows exist only inside one map stage, never as
  a join probe side (measured 4.0 s → 0.6 s for the loop at sf0.1
  vs the flat edge-table formulation).
* Plan depth grows LINEARLY in iterations (each rank feeds only the
  next); for deep iteration counts a production job would checkpoint
  every ~10 rounds — at 5 the lineage is shallow and checkpointing
  would cost more than it saves.

Cross-engine determinism: rank mass is FIXED-POINT — BIGINT units out
of 10^15 — and every step is integer arithmetic (integral division by
outdeg, exact integer sums, integer damping (85*s) div 100). Double
summation order and double→decimal conversion rules differ between
engines (measured: last-ulp drift on 15% of nodes with a
decimal(38,18) float formulation), but integer arithmetic is
bit-identical by construction; the quantization error is bounded by
one unit (1e-15) per edge per iteration, far below anything a rank
consumer can observe. The double `rank` column is derived from the
same integer in both engines at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: Damping = _DAMP_NUM/_DAMP_DEN; fixed iteration count; total rank
#: mass in fixed-point units (10^15 leaves 85*10^15 « int64 max).
_DAMP_NUM = 85
_DAMP_DEN = 100
_ITERS = 5
_TOTAL = 10 ** 15

#: Staged (edges, degrees, n_nodes) per (SparkContext, sf_dir).
_EDGE_CACHE: dict = {}


def _co_adjacency(spark: SparkSession, sf_dir: str):
    """Staged ADJACENCY-LIST form of the co-purchase graph:
    (src, dsts array, outdeg) — one row per node — plus node count.

    Why adjacency lists and not an edge table: the iteration joins
    RANKS (nodes-sized) onto the graph; against a flat edge relation
    that join probes |E| rows every round, against the adjacency
    relation it probes |V| rows and the |E| contribution rows only
    come into existence AFTER the join via explode, flowing straight
    into their groupBy exchange (measured at sf0.1: 4.0 s → 0.6 s
    for the 5-iteration loop). This is the layout every serious graph
    engine (Pregel, GraphX) keeps. Skew note: one array per node
    means a celebrity node materializes its whole neighbor list in
    one row — co-purchase degree is order-size-bounded here; for
    power-law graphs split high-degree adjacency rows into fixed-size
    chunks (same contract as the LSH bucket caps)."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_CACHE.get(key)
    if cached is not None:
        return cached
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") != F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    adj = (edges.groupBy("src")
           .agg(F.collect_list("dst").alias("dsts"),
                F.count("*").alias("outdeg"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    n_nodes = adj.count()
    # Directed edge count (Σ outdeg), read off the just-persisted
    # relation in one tiny agg: q_part_pagerank sizes its per-round
    # frontier stage by the EDGE volume the stage explodes (r11).
    n_edges = adj.agg(F.sum("outdeg")).first()[0] or 0
    _EDGE_CACHE[key] = (adj, n_nodes, n_edges)
    return adj, n_nodes, n_edges


def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations, uniform init) over the
    part co-purchase graph, in fixed-point integer mass. Returns
    (node, units, rank) for every part that co-occurs with at least
    one other part; `rank` = units / 1e15 as a plain double.

    The loop builds the logical plan iteratively — Catalyst sees five
    join+agg rounds against one persisted edge relation; nothing is
    collected to the driver."""
    adj, n, n_edges = _co_adjacency(spark, sf_dir)
    base = (_DAMP_DEN - _DAMP_NUM) * _TOTAL // (_DAMP_DEN * n)
    ranks = adj.select(F.col("src").alias("node"),
                       F.lit(_TOTAL // n).cast("long").alias("units"))
    # Per-round frontier width (r11; guide §2.2/§2.6): each round's
    # reduce stage is a separate AQE-materialized job, and the
    # engine-wide 64 KiB coalescing floor (session.py, a win for the
    # CPU-bound keyed stages) splits the small sf0.1 frontier into
    # dozens of micro-tasks whose scheduling overhead exceeds their
    # work (driver-measured r10 regression: 2.10 → 2.44 s). The
    # coalesce caps the WHOLE fused stage — final rank agg PLUS the
    # next round's join+explode map work — so the width must scale
    # with the EDGE volume that stage explodes, not the node count
    # (a |V|-derived width starved the sf1 map work: 3.8 → 5.9 s
    # measured). The stage's dominant work is the |E|-row explode +
    # partial agg (~50-100 ns/row of codegen'd integer work), so the
    # width targets ~500 k edge rows per task — tens of ms, the
    # classic task-size floor; the sf0.1 width sweep measured 1/2/5/
    # 10 all ≈1.25-1.34 s vs 2.06 s uncapped, and ceil(|E|/500k)
    # lands on 5. When the edge-derived width reaches the cluster
    # parallelism the Coalesce node is OMITTED entirely (width =
    # None), not emitted as a same-count no-op: a user coalesce
    # blocks AQE's own runtime coalescing of that stage, and at sf1
    # (|E| 24 M, adjacency past the broadcast threshold, SMJ rounds)
    # the "no-op" coalesce(32) measured 3.5 → 4.2 s.
    _EDGE_ROWS_PER_TASK = 500_000
    width = max(1, -(-n_edges // _EDGE_ROWS_PER_TASK))
    if width >= spark.sparkContext.defaultParallelism:
        width = None
    for _ in range(_ITERS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(F.explode("dsts").alias("dst"),
                    F.expr("units div outdeg").alias("c"))
        )
        # Edges are SYMMETRIC, so indegree >= 1 everywhere and the
        # contribution sums already cover every node — the textbook
        # "left-join ranks back onto nodes" round-trip would be 5
        # extra joins computing an identity (measured: 3.5 s → 1.6 s
        # for the loop at sf0.1 without them). The aggregate IS the
        # next rank relation.
        ranks = (
            contribs.groupBy("dst").agg(F.sum("c").alias("s"))
            .select(F.col("dst").alias("node"),
                    (F.lit(base).cast("long")
                     + F.expr(f"({_DAMP_NUM} * s) div {_DAMP_DEN}")
                     ).alias("units"))
        )
        if width is not None:
            ranks = ranks.coalesce(width)
    return ranks.select(
        "node", "units",
        (F.col("units").cast("double") / F.lit(float(_TOTAL))).alias("rank"))


def _pagerank_sql() -> str:
    """Unrolled 5-iteration CTE chain — the exact integer-arithmetic
    twin of q_part_pagerank (`//` is floor division; all quantities
    are non-negative, so it matches Spark's truncating `div`)."""
    base = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
n AS (SELECT COUNT(*) AS n FROM deg),
nodes AS (SELECT src AS node FROM deg),
r0 AS (SELECT node,
              CAST({_TOTAL} // n.n AS BIGINT) AS units
       FROM nodes, n)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f""",
c{i} AS (
  SELECT e.dst AS node,
         CAST(r{i - 1}.units // deg.outdeg AS BIGINT) AS c
  FROM e JOIN r{i - 1} ON e.src = r{i - 1}.node
         JOIN deg ON e.src = deg.src),
r{i} AS (
  SELECT node,
         CAST(({_DAMP_DEN - _DAMP_NUM} * {_TOTAL})
              // ({_DAMP_DEN} * n.n)
              + ({_DAMP_NUM} * CAST(SUM(c) AS BIGINT)) // {_DAMP_DEN}
              AS BIGINT) AS units
  FROM c{i}, n GROUP BY node, n.n)""")
    return (base + "".join(steps)
            + f"""
SELECT node, units, CAST(units AS DOUBLE) / {float(_TOTAL)} AS rank
FROM r{_ITERS}""")


#: Staged (oriented edges, oriented adjacency) per (SparkContext, sf_dir).
_TRI_CACHE: dict = {}

#: Broadcast gate for the triangle query's V-sized adjacency sides:
#: up to this many nodes the two adjacency joins broadcast (~10 MB at
#: the sf0.1 graph's 20 k nodes — the fast single-stage plan); beyond
#: it they fall back to sort-merge, because a broadcast build
#: materializes every out-array in the DRIVER heap first (measured:
#: the ~2 M-node sf10 probe graph OOMs an 8 g driver mid-build).
_TRI_BCAST_MAX_NODES = 200_000


def _oriented_adjacency(spark: SparkSession, sf_dir: str):
    """Degree-ordered oriented edge set + its adjacency-list form,
    STAGED like _co_adjacency: the triangle query references the
    oriented relation on three sides (edge stream + both broadcast
    adjacency builds), and Spark re-executes unpersisted subtrees per
    reference — staging runs the orientation join once."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TRI_CACHE.get(key)
    if cached is not None:
        return cached
    adj, _n, _e = _co_adjacency(spark, sf_dir)
    edges = adj.select("src", "outdeg", F.explode("dsts").alias("dst"))
    dd = adj.select(F.col("src").alias("dst"),
                    F.col("outdeg").alias("dst_deg"))
    oriented = (
        edges.join(dd, "dst")
        .filter(F.struct(F.col("outdeg"), F.col("src"))
                < F.struct(F.col("dst_deg"), F.col("dst")))
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK))
    out_adj = (oriented.groupBy("src")
               .agg(F.collect_list("dst").alias("outs"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    out_adj.count()
    _TRI_CACHE[key] = (oriented, out_adj)
    return oriented, out_adj


# ---------------------------------------------------------------------------
# Triangle counting / local clustering coefficient
# ---------------------------------------------------------------------------

def q_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the part co-purchase graph — the motif-counting workload next to
    PageRank in every graph-analytics suite (community density,
    recommendation neighborhoods).

    Algorithm: degree-ordered orientation (each undirected edge
    directed from the lower (degree, id) endpoint to the higher)
    plus the EDGE-ITERATOR intersection form: for every oriented
    edge (u, v), the triangles through it are out(u) ∩ out(v) — an
    array_intersect over the two oriented adjacency lists, evaluated
    INSIDE whole-stage codegen. The naive alternative (materialize
    all out(u)×out(u) wedges, close them with a join) shuffles the
    wedge set as rows — 83 M of them at sf0.1, measured 14 s; here
    the same comparisons happen map-side and only ACTUAL triangles
    ever become rows (26× less wall time). Orientation bounds every
    out-list by √(2|E|) regardless of raw degree — the property
    that makes this survive power-law graphs at 100 TB (cf. Suri &
    Vassilvitskii 2011, public). Each triangle {u,v,w}, k(u)<k(v)<
    k(w), is found exactly once, at edge (u,v): u and v take the
    intersection SIZE, w-attribution explodes only the O(T)
    intersection members.

    Reuses the STAGED adjacency relation (edges = explode(dsts), so
    the lineitem self-join runs zero extra times; symmetric edges ⇒
    outdeg IS the undirected degree). Oracle: the a<b<c canonical
    join formulation — a different orientation, the identical
    triangle set. clustering = 2·tri/(deg·(deg−1)), NULL for
    degree-1 nodes."""
    adj, n_nodes, _n_edges = _co_adjacency(spark, sf_dir)
    degs = adj.select(F.col("src").alias("node"),
                      F.col("outdeg").alias("degree"))
    oriented, out_adj = _oriented_adjacency(spark, sf_dir)
    u_adj = out_adj.select(F.col("src").alias("u_key"),
                           F.col("outs").alias("u_outs"))
    v_adj = out_adj.select(F.col("src").alias("v_key"),
                           F.col("outs").alias("v_outs"))
    # Both adjacency joins BROADCAST (|V| rows, ~10 MB at sf0.1): a
    # sort-merge second join would shuffle the 1.2 M-row intermediate
    # WITH its 60-element u_outs arrays (~600 MB) — measured 5-6 s;
    # broadcasting keeps the fat rows inside one codegen stage and
    # the only shuffle left is the final per-node rollup. At a scale
    # where V-sized adjacency outgrows broadcast, partition BOTH
    # sides by the join key once and run the two joins storage-
    # co-located (the bucketed-join pattern in ops/scale.py).
    # Candidate pruning before the intersection (r6): a triangle at
    # edge (u, v) needs w ∈ out(u) ∩ out(v), so (a) u must have ≥ 2
    # out-neighbors (v and w), (b) v must have ≥ 1 — the v-side join
    # is INNER, dropping sink-dst edges outright instead of carrying
    # them to an empty intersection (the former left join + coalesce
    # produced ws = [] for them and filtered afterwards; same rows
    # survive, less intersection CPU).
    # The broadcast is SIZE-GATED (r10): building a broadcast
    # materializes the whole V-sized adjacency (with its out-arrays)
    # in the driver heap — fine at sf0.1 (~20 k nodes, ~10 MB),
    # measured OOM-fatal at the sf10 probe fixture (~2 M nodes,
    # multi-GB) on an 8 g driver. Past the gate the query takes the
    # co-partitioned sort-merge path the paragraph above describes —
    # same rows, two extra exchanges, no driver-side materialization.
    u_side = u_adj.filter(F.size("u_outs") >= 2)
    v_side = v_adj
    if n_nodes <= _TRI_BCAST_MAX_NODES:
        u_side, v_side = F.broadcast(u_side), F.broadcast(v_side)
    closed = (
        oriented
        .join(u_side, oriented["src"] == u_adj["u_key"])
        .join(v_side, oriented["dst"] == v_adj["v_key"])
        .select(
            "src", "dst",
            F.array_intersect("u_outs", "v_outs").alias("ws"))
        .withColumn("n_ws", F.size("ws"))
        .filter(F.col("n_ws") > 0))
    # All three triangle attributions (u and v take the intersection
    # SIZE, each w member takes 1) emit from ONE pass over `closed`:
    # the former 3-leg unionAll re-executed the whole join+intersect
    # subtree per leg — 3× the query's dominant stage (measured at
    # sf0.1: the contribution stage ran 96 tasks / 92 exec-seconds;
    # one-pass cuts it to 32 / ~31). explode_outer, not explode: the
    # optimizer infers `size(e) > 0` for plain explode and pushes the
    # whole concat/transform expression into a filter below, doubling
    # its evaluation (see verify-skill note); the array here is never
    # empty (>= 2 entries), so the rows are identical.
    t_long = F.col("n_ws").cast("long")
    contribs = closed.select(F.explode_outer(F.concat(
        F.array(
            F.struct(F.col("src").alias("node"), t_long.alias("t")),
            F.struct(F.col("dst").alias("node"), t_long.alias("t"))),
        F.transform(
            "ws",
            lambda w: F.struct(w.alias("node"),
                               F.lit(1).cast("long").alias("t"))),
    )).alias("c")).select("c.node", "c.t")
    tn = contribs.groupBy("node").agg(F.sum("t").alias("n_triangles"))
    deg_d = F.col("degree").cast("double")
    return (degs.join(tn, "node", "left")
            .select(
                "node", "degree",
                F.coalesce(F.col("n_triangles"), F.lit(0).cast("long"))
                .alias("n_triangles"),
                F.when(F.col("degree") >= 2,
                       F.lit(2.0)
                       * F.coalesce(F.col("n_triangles"),
                                    F.lit(0)).cast("double")
                       / (deg_d * (deg_d - F.lit(1.0))))
                .alias("clustering"))
            .orderBy("node"))


_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src AS node, COUNT(*) AS degree FROM e GROUP BY src),
c AS (SELECT src, dst FROM e WHERE src < dst),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM c e1
  JOIN c e2 ON e2.src = e1.dst
  JOIN c e3 ON e3.src = e1.src AND e3.dst = e2.dst),
members AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
tn AS (SELECT node, COUNT(*) AS n_triangles FROM members GROUP BY node)
SELECT d.node, d.degree,
       CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         2.0 * CAST(COALESCE(tn.n_triangles, 0) AS DOUBLE)
           / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0))
       END AS clustering
FROM deg d LEFT JOIN tn USING (node)
ORDER BY d.node
"""


# ---------------------------------------------------------------------------
# k-core decomposition (bounded-round peeling / onion layers)
# ---------------------------------------------------------------------------

#: Core threshold and fixed peel-round budget. The REPEAT graph
#: (co-purchase edges with multiplicity ≥ _KCORE_M) reaches its
#: 2-core fixpoint in ≤ 6 rounds on every fixture (measured 1/4/6 at
#: sf0.001/0.01/0.1), so 8 rounds = converged output; the bounded
#: unroll is what makes the query oracle-checkable (the same fixed
#: CTE chain on both engines, the q_part_pagerank discipline).
_KCORE_K = 2
_KCORE_M = 2
_KCORE_ROUNDS = 8

#: Staged repeat-co-purchase edge relation per (appId, sf_dir).
_KCORE_CACHE: dict = {}


def _repeat_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric co-purchase edges kept only when the pair co-occurs
    in ≥ _KCORE_M distinct orders — the REPEAT-signal graph (one
    shared basket is noise; two is a relationship), and the sparse
    graph where peeling does real work (the raw graph's minimum
    degree is ~40, making every node a trivial 2-core member).
    Staged: the peel loop references it _KCORE_ROUNDS + 2 times."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _KCORE_CACHE.get(key)
    if cached is not None:
        return cached
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") != F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("src"),
                 F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= _KCORE_M)
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK))
    edges.count()
    _KCORE_CACHE[key] = edges
    return edges


def q_part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the repeat-co-purchase graph by
    _KCORE_ROUNDS peel rounds — the graph-sparsification primitive
    (spam/outlier pruning on web graphs, community nuclei, the
    degeneracy ordering behind triangle counting): repeatedly delete
    nodes with fewer than k surviving neighbors; what remains is the
    k-core, and the round a node dies is its ONION LAYER (peel_round;
    NULL for core members, whose degree within the final subgraph is
    core_degree).

    Scale shape: per round, the node set semi-restricts the staged
    edge relation (two BROADCAST joins — the active set is node-
    sized) and one map-side-combined degree count; the peeled-node
    union rows are emitted as they die. The whole decomposition is a
    LAZY _KCORE_ROUNDS-deep plan over one persisted edge relation —
    no driver loop state, no collect (the q_part_pagerank shape). At
    web scale the broadcast becomes a shuffle semi-join and rounds
    batch into doubling passes; k-core peeling is O(|E|) total work
    regardless (each edge dies once).

    Exactness: degrees and layers are pure integer set logic —
    bit-identical on any engine; the oracle unrolls the identical
    fixed round chain."""
    edges = _repeat_edges(spark, sf_dir)
    # Each round references `active` three times (both semi-joins +
    # the anti-join), so a fully lazy loop TRIPLES the plan tree per
    # round (3⁸ copies of the base subtree — Catalyst chokes);
    # localCheckpoint truncates the node-sized relation each round,
    # keeping the per-round plan constant. Same discipline as
    # cc_alternating; q_part_pagerank can stay lazy only because its
    # rank relation is referenced once per round.
    # The node-state relation is |V|-sized (a few thousand rows at
    # fixture scale) yet inherits 32 shuffle partitions — per-round
    # job cost is then task scheduling, not work. coalesce(1) before
    # each checkpoint: one task per round job, and the subsequent
    # broadcasts read one block. At web scale (|V| beyond one task)
    # drop the coalesce and let the semi-joins shuffle — the loop
    # structure is unchanged.
    # The peel loop is EAGER (localCheckpoint + count per round), so
    # AQE is scoped OFF around it and restored before the lazy result
    # is returned (the q_pca_power_iteration discipline, r11): each
    # round's V-sized degree job otherwise pays AQE's per-exchange
    # materialization jobs to re-plan a coalesce(1)-capped shuffle —
    # measured same-session 4.3-4.7 → 3.1-3.9 s for the build.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    peeled = []
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        active = (edges.select(F.col("src").alias("node")).distinct()
                  .coalesce(1).localCheckpoint())
        n_active = active.count()
        for i in range(1, _KCORE_ROUNDS + 1):
            sa = active.select(F.col("node").alias("src"))
            sb = active.select(F.col("node").alias("dst"))
            deg = (edges
                   .join(F.broadcast(sa), "src")
                   .join(F.broadcast(sb), "dst")
                   .groupBy("src").agg(F.count("*").alias("c")))
            surv = (deg.filter(F.col("c") >= _KCORE_K)
                    .select(F.col("src").alias("node"))
                    .coalesce(1).localCheckpoint())
            peeled.append(
                active.join(F.broadcast(surv), "node", "left_anti")
                .select("node", F.lit(i).alias("peel_round")))
            n_surv = surv.count()
            removed_any = n_surv != n_active
            active, n_active = surv, n_surv
            # A round that removes nothing IS the fixpoint — every
            # later round would recompute identical degrees and
            # remove nothing, so skipping them cannot change the
            # output (the oracle keeps the full unroll; its extra
            # rounds are the same no-ops). The count is a free read
            # off the just-checkpointed relation.
            if not removed_any:
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    sa = active.select(F.col("node").alias("src"))
    sb = active.select(F.col("node").alias("dst"))
    core_deg = (edges
                .join(F.broadcast(sa), "src")
                .join(F.broadcast(sb), "dst")
                .groupBy("src").agg(F.count("*").alias("core_degree")))
    core = (active.join(
        F.broadcast(core_deg.withColumnRenamed("src", "node")),
        "node", "left")
            .select("node", F.lit(None).cast("int").alias("peel_round"),
                    "core_degree"))
    out = core
    for p in peeled:
        out = out.unionByName(
            p.select("node", "peel_round",
                     F.lit(None).cast("long").alias("core_degree")))
    return out.orderBy("node")


def _kcore_sql() -> str:
    base = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_KCORE_M}),
a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)"""
    steps, removed = [], []
    prev = "a0"
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(f""",
d{i} AS (
  SELECT e.src AS node, COUNT(*) AS c
  FROM e JOIN {prev} s ON e.src = s.node JOIN {prev} t ON e.dst = t.node
  GROUP BY e.src),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {_KCORE_K}),
r{i} AS (
  SELECT p.node, {i} AS peel_round FROM {prev} p
  LEFT JOIN a{i} q ON p.node = q.node WHERE q.node IS NULL)""")
        removed.append(f"SELECT node, peel_round, "
                       f"CAST(NULL AS BIGINT) AS core_degree FROM r{i}")
        prev = f"a{i}"
    final = f""",
dcore AS (
  SELECT e.src AS node, COUNT(*) AS core_degree
  FROM e JOIN {prev} s ON e.src = s.node JOIN {prev} t ON e.dst = t.node
  GROUP BY e.src)
SELECT node, CAST(NULL AS INTEGER) AS peel_round, core_degree
FROM {prev} LEFT JOIN dcore USING (node)
UNION ALL
""" + "\nUNION ALL\n".join(removed) + "\nORDER BY node"
    return base + "".join(steps) + final


# ---------------------------------------------------------------------------
# BFS hop distance (bounded-round frontier expansion)
# ---------------------------------------------------------------------------

#: Fixed BFS round budget (the bounded-unroll discipline of
#: _KCORE_ROUNDS; the repeat graph's reachable set from the minimum
#: node stabilizes well inside it on every fixture).
_BFS_ROUNDS = 8


def q_part_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distance over the repeat-co-purchase
    graph (source = the minimum node id): the Pregel frontier-
    expansion shape — per round, ONE edges⋈frontier semi-join
    produces the next candidate layer, an anti-join against the
    reached set keeps only new nodes, and the frontier is exactly
    that layer (each edge is traversed at most twice total, the
    textbook distributed-BFS work bound). Nodes beyond _BFS_ROUNDS
    hops or in other components are absent — the bounded-round
    contract shared with q_part_kcore; an empty frontier exits early
    (all later rounds are provably no-ops). Node-state relations are
    coalesced to one task at fixture scale (see q_part_kcore note).

    Exactness: hop labels are pure set logic, and each node joins the
    reached set at its MINIMUM hop by construction (it is excluded
    from every later layer) — identical in the oracle's unrolled
    MATERIALIZED CTE chain."""
    edges = _repeat_edges(spark, sf_dir)
    # Eager expansion loop → AQE scoped OFF and restored, exactly the
    # q_part_kcore note above (r11).
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        reached = (edges.agg(F.min("src").alias("node"))
                   .withColumn("hops", F.lit(0))
                   .coalesce(1).localCheckpoint())
        frontier = reached.select("node")
        for i in range(1, _BFS_ROUNDS + 1):
            nxt = (edges
                   .join(F.broadcast(
                       frontier.withColumnRenamed("node", "src")), "src")
                   .select(F.col("dst").alias("node")).distinct())
            new = (nxt.join(F.broadcast(reached.select("node")),
                            "node", "left_anti")
                   .withColumn("hops", F.lit(i))
                   .coalesce(1).localCheckpoint())
            if new.limit(1).count() == 0:
                break
            reached = (reached.unionByName(new)
                       .coalesce(1).localCheckpoint())
            frontier = new.select("node")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return reached.orderBy("node")


def _bfs_sql() -> str:
    base = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_KCORE_M}),
a0 AS MATERIALIZED (SELECT MIN(src) AS node, 0 AS hops FROM e),
f0 AS MATERIALIZED (SELECT node FROM a0)"""
    steps = []
    prev_a, prev_f = "a0", "f0"
    for i in range(1, _BFS_ROUNDS + 1):
        steps.append(f""",
r{i} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node, {i} AS hops
  FROM e JOIN {prev_f} f ON e.src = f.node
  WHERE e.dst NOT IN (SELECT node FROM {prev_a})),
a{i} AS MATERIALIZED (
  SELECT node, hops FROM {prev_a} UNION ALL SELECT node, hops FROM r{i}),
f{i} AS MATERIALIZED (SELECT node FROM r{i})""")
        prev_a, prev_f = f"a{i}", f"f{i}"
    return (base + "".join(steps)
            + f"\nSELECT node, hops FROM {prev_a} ORDER BY node")


QUERIES = {
    "part_pagerank": (q_part_pagerank, _pagerank_sql()),
    "part_triangles": (q_part_triangles, _TRIANGLES_SQL),
    "part_kcore": (q_part_kcore, _kcore_sql()),
    "part_bfs_hops": (q_part_bfs_hops, _bfs_sql()),
}

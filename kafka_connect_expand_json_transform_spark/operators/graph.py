"""Graph analytics over edge tables — iterative PageRank in exact integer
arithmetic.

The reference has no graph surface (SURVEY.md §2.1 — its only operator is the
JSON expansion SMT); this is an `[EXT]` operator for the analytics engine
around it, in the same spirit as the distributed k-means
(`llmops/similarity.py`): an ITERATIVE algorithm made oracle-checkable by
doing every step in fixed-point int64 so Spark and DuckDB agree bit-for-bit.

Scale design: the rank vector is |V| rows keyed by node and every round is
one join edges⋈ranks + one partial-aggregated groupBy(dst) — the classic
message-passing shape. The edge table is built once and every round reuses
its shuffle output (ReusedExchange); at real scale (billions of edges) the
rank frame stays hash-partitioned on node across rounds and each round would
`localCheckpoint` to bound lineage, exactly as the connected-components loop
in `llmops/dedup.py` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_Q = 1_000_000_000_000  # total rank mass in fixed-point units (1e12)


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint: bool = True,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, n)`` in exact int64 arithmetic.

    Rank mass starts at ``TOTAL_Q div |V|`` per node; each round every node
    sends ``(r * n) div out_n`` along each out-edge and the new rank is
    ``(15% of TOTAL_Q) div |V| + (85 * inbound) div 100`` — all trunc-toward-
    zero integer division (Spark ``div`` == DuckDB ``//`` on positives), so a
    chained-CTE SQL oracle reproduces every round exactly. Truncation loses
    <1 unit per op at 1e12 scale: ~1e-10 relative error, far below any
    ranking-relevant difference.

    Overflow headroom: per-edge products are ``r * n <= TOTAL_Q * max(n)``;
    with int64 that allows edge multiplicities up to ~9e6. For larger corpora
    normalize edge weights first (divide ``n`` by their GCD or bucket them).
    """
    teleport_total = damping_pct_complement(damping_pct)
    if checkpoint:
        # the edge aggregate is consumed by every round (plus nodes/outd);
        # cutting lineage here keeps iteration plans O(1) instead of
        # re-embedding the full upstream scan per round — the same bounded-
        # lineage discipline as the connected-components loop
        edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    outd = edges.groupBy("src").agg(F.sum("n").alias("out_n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{TOTAL_Q} div n_nodes").alias("r")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outd, "src")
            .groupBy("dst")
            .agg(F.expr("sum((r * n) div out_n)").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.expr(
                    f"({teleport_total} div n_nodes)"
                    f" + ({damping_pct} * coalesce(s, 0)) div 100"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").cast("bigint").alias("pagerank"))


def damping_pct_complement(damping_pct: int) -> int:
    """Teleport mass in fixed-point units: ((100 - d) * TOTAL_Q) div 100."""
    return (100 - damping_pct) * TOTAL_Q // 100


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle count over an undirected edge table — one row
    ``(n_nodes, n_edges, n_triangles)``.

    Degree-oriented adjacency intersection (the standard O(m^1.5) bound):
    canonicalize + dedup edges, compute degrees, then orient every edge from
    the endpoint with lexicographically smaller ``(degree, id)`` to the
    larger — out-degrees are then bounded ~O(sqrt(m)), so a celebrity node
    with degree d contributes nothing quadratic in d. Each triangle
    (u < v < w in orientation order) is counted exactly once at its lowest
    edge as ``w ∈ N+(u) ∩ N+(v)``: the oriented edge table joins the
    collected out-neighbor lists of both endpoints and sums
    ``size(array_intersect)``. Crucially the wedge set (potentially 30×
    |edges|) is never materialized or shuffled — only |edges| rows carrying
    ~sqrt(m)-element arrays move, and the intersection runs JVM-side inside
    the join stage. Three shuffles (degree agg, adjacency agg, edge⋈adj).
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    withdeg = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    )
    lo_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    adj = oriented.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    per_edge = (
        oriented.join(
            adj.select(F.col("lo").alias("lo"), F.col("nbrs").alias("nu")), "lo"
        )
        .join(
            adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nv")),
            "hi",
            "left",  # orientation-maximal vertices have no out-list
        )
        .select(
            F.size(
                F.array_intersect(F.col("nu"), F.coalesce(F.col("nv"), F.array()))
            ).alias("closed")
        )
    )
    tri = per_edge.agg(
        F.coalesce(F.sum("closed"), F.lit(0)).cast("long").alias("n_triangles")
    )
    stats = e.agg(
        F.count("*").cast("long").alias("n_edges"),
    ).crossJoin(deg.agg(F.count("*").cast("long").alias("n_nodes")))
    return stats.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def undirect(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = False,
) -> DataFrame:
    """Symmetrize an edge table to distinct undirected ``(s, d)`` rows, no
    self-loops.  Dedup runs on the CANONICAL half only (least/greatest) and
    the mirror is a narrow union afterwards — mirroring a distinct set stays
    distinct, so the expensive shuffle sees half the rows the naive
    union-then-distinct order would push through it.  With ``checkpoint``
    the canonical half materializes once (``localCheckpoint``) so the union
    does not compute the dedup twice and iterative callers reuse it."""
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.select(F.least(a, b).alias("s"), F.greatest(a, b).alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    if checkpoint:
        canon = canon.localCheckpoint(eager=False)
    return canon.unionAll(
        canon.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous label propagation (community detection) over an undirected
    edge table: every node starts labeled with its own id; each round every
    node adopts the most frequent label among its NEIGHBORS, ties broken by
    the smallest label (Raghavan et al. 2007, made deterministic).  Returns
    ``(node, label)`` after ``rounds`` synchronous updates.

    Fully deterministic (frequency argmax with min-label tie-break, no random
    visit order), so a chained-CTE SQL oracle reproduces every round exactly
    — the community-detection twin of ``pagerank_int``.

    Scale: each round is one join (edges ⋈ labels, both hash-partitioned on
    the join key) + one partial-aggregated groupBy((node, label)) + one
    groupBy(node) argmax via ``max(struct(count, -label))`` — a single-pass
    aggregate, NOT a per-node sort window.  The undirected edge table is
    materialized once (``localCheckpoint``) and its shuffle output reused
    every round; labels checkpoint per round to bound lineage exactly like
    the connected-components loop in ``llmops/dedup.py``.
    """
    und = undirect(edges, src=src, dst=dst, checkpoint=checkpoint)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(rounds):
        msgs = und.join(labels, und["s"] == labels["node"]).select(
            F.col("d").alias("node"), "label"
        )
        votes = msgs.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).alias("label"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


def bfs_hops(
    edges: DataFrame,
    source: object,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    prebuilt_undirected: bool = False,
) -> DataFrame:
    """Unweighted BFS hop distances from ``source`` over an undirected edge
    table, bounded to ``rounds`` relaxation rounds: returns ``(node, dist)``
    for every node within ``rounds`` hops.  Each round applies the Bellman-
    Ford relaxation dist(v) = min(dist(v), min_{u in N(v)} dist(u) + 1) —
    fully deterministic integer arithmetic, so a chained-CTE SQL oracle
    reproduces every round exactly (the traversal sibling of
    ``pagerank_int`` / ``label_propagation``).

    Scale: the frontier table is ≤|V| rows of two int64s; each round is one
    edges⋈dist join + one partial-aggregated min groupBy.  A production BFS
    would carry only the NEW frontier per round (delta iteration) — here the
    whole reached set re-relaxes, which is identical for ≤3 rounds and keeps
    the oracle a pure chained CTE; the delta variant is the same two
    operators plus an anti-join.  Edges are checkpointed once and their
    shuffle reused every round; dist checkpoints per round to bound lineage.

    ``prebuilt_undirected``: pass True when ``edges`` is ALREADY a distinct
    symmetrized (s, d) table (e.g. from ``undirect``) — callers that also
    need the undirected table for degree/hub selection reuse one build
    instead of paying the symmetrize-dedup shuffle twice.
    """
    if prebuilt_undirected:
        und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    else:
        und = undirect(edges, src=src, dst=dst, checkpoint=checkpoint)
    dist = und.sparkSession.createDataFrame(
        [(source, 0)], "node long, dist long"
    )
    for _ in range(rounds):
        relaxed = (
            und.join(dist, und["s"] == dist["node"])
            .select(F.col("d").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            dist = dist.localCheckpoint(eager=False)
    return dist


def per_vertex_triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts ``(v, n_tri)`` over an undirected edge
    table — the local-structure companion of ``triangle_count`` (which
    returns only the global total).  Same degree-oriented plan: orient
    every edge low→high by (degree, id), collect out-neighbor lists, and
    for each oriented edge (u, v) EXPLODE the intersection N+(u) ∩ N+(v) —
    each element w closes exactly one triangle {u, v, w}, credited to all
    three vertices by a 3-way union.  The explode materializes |triangles|
    rows (bounded by the triangle count itself, not the wedge count);
    out-degrees stay ~O(sqrt(m)) so no celebrity blowup.  Vertices in no
    triangle are absent — callers LEFT-join and coalesce to 0."""
    a, b = F.col(src), F.col(dst)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    withdeg = e.join(
        deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    lo_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    adj = oriented.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    tris = (
        oriented.join(
            adj.select(F.col("lo").alias("lo"), F.col("nbrs").alias("nu")), "lo"
        )
        .join(
            adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nv")),
            "hi",
            "left",
        )
        .select(
            "lo",
            "hi",
            F.explode(
                F.array_intersect(F.col("nu"), F.coalesce(F.col("nv"), F.array()))
            ).alias("w"),
        )
    )
    verts = (
        tris.select(F.col("lo").alias("v"))
        .unionAll(tris.select(F.col("hi").alias("v")))
        .unionAll(tris.select(F.col("w").alias("v")))
    )
    return verts.groupBy("v").agg(F.count("*").cast("bigint").alias("n_tri"))

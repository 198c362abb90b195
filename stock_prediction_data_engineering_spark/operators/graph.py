"""Distributed graph analytics over edge-list DataFrames: PageRank by
power iteration.

Joins `operators/dedup.py::connected_components` (min-label
propagation) to round out the iterative-graph family. The graphs this
engine meets are derived ones — the near-dup pair graph, the
customer↔supplier purchase graph — small relative to the fact tables
that generate them, but still far beyond driver memory at 100 TB, so
the iteration must be keyed joins + keyed aggregates with lineage
truncation, never an adjacency matrix.

Scale shape per round: ranks ⨝ edges (hash on src — the one shuffle;
pre-partitioning edges by src lets every round reuse the exchange),
a keyed sum per dst, plus two 1-row aggregates (dangling mass,
convergence delta). ``localCheckpoint`` per round truncates lineage
(the standard Spark iterative pattern). Floating-point note: the
per-dst sums are distributed reductions, so ranks are deterministic
only up to summation order — callers needing bit-stable output should
round; tests pin values against a numpy reference at 1e-9.

No reference-repo counterpart (the reference is a 131-line ingest
DAG); north-star analytics surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(id, rank) for every node of the directed edge list; ranks sum
    to 1. Dangling nodes (no out-edges) redistribute their mass
    uniformly, the standard correction — without it rank mass drains
    every iteration and cross-engine comparisons are meaningless.

    Stops after ``max_iterations`` or when the L1 delta between
    successive rank vectors falls below ``tol``. ``tol=0`` disables
    the convergence check — and with it one driver action per round
    (the delta join) — for fixed-iteration runs.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(max_iterations):
        with_deg = ranks.join(
            outdeg, ranks["id"] == outdeg["src"], "left"
        ).select("id", "rank", "deg")
        # mass leaving via edges; dangling nodes contribute uniformly.
        # The dangling mass stays a lazy 1-row aggregate cross-joined
        # (broadcast) into the update — collecting it per round would
        # cost an extra driver action each iteration.
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()),
                e["src"] == with_deg["id"],
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_mass", F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # lineage truncation every 4 rounds (and on the last) instead
        # of per round — each eager checkpoint is a full job, and the
        # plans in between stay shallow enough for the analyzer
        if tol > 0.0 or it % 4 == 3 or it == max_iterations - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol > 0.0:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "id")
                .agg(
                    F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
                )
                .collect()[0]["d"]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def count_triangles(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected simple graph, degree-
    oriented (the distributed standard, e.g. Suri & Vassilvitskii's
    MR-friendly scheme from the public literature).

    ``edges`` must have columns (x, y) with x < y, distinct — one row
    per undirected edge. Each edge is oriented from its lower
    (degree, id) endpoint to the higher; wedges are generated only
    from out-neighbor pairs and closed with a semi-join. Orientation
    bounds out-degree by O(sqrt(E)), so a hub node cannot explode the
    wedge join the way it does in the naive three-way self-join.

    Returns ONE row: (n_nodes, n_edges, n_triangles).
    """
    # edge table is read 4x (degrees, both orient sides, closing
    # probe); materialize once — see operators/ssjoin.py for the
    # localCheckpoint-vs-persist trade
    edges = edges.select("x", "y").localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("x").alias("v"))
        .unionAll(edges.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("deg").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("deg").alias("dy"))
    ed = edges.join(dx, "x").join(dy, "y")
    fwd = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.when(fwd, F.col("dy")).otherwise(F.col("dx")).alias("ddeg"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            (F.col("o1.ddeg") < F.col("o2.ddeg"))
            | (
                (F.col("o1.ddeg") == F.col("o2.ddeg"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        ),
    ).select(F.col("o1.dst").alias("src"), F.col("o2.dst").alias("dst"))
    tris = wedges.join(oriented.select("src", "dst"), ["src", "dst"], "left_semi")
    n_nodes = deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    n_tris = tris.agg(F.count("*").cast("bigint").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tris)

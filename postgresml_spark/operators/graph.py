"""Graph operators over edge-list DataFrames (beyond the reference's
surface: corpus/link analysis a training-data pipeline needs — domain
authority for quality weighting, duplicate-cluster structure, event
graphs).

Design: edge lists are plain DataFrames, iterations are unrolled into
one lazy Catalyst plan (no driver-side collect of node state). The
per-iteration shape is join-on-src → groupBy(dst) — each iteration is
one shuffle on the node key at cluster scale; for bounded node sets
(event types, domains) the rank side broadcasts and iterations are
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["transition_edges", "pagerank", "bfs_levels", "triangle_count"]


def transition_edges(
    df: DataFrame,
    seq_col: str,
    order_cols: list[str],
    partition_col: str,
) -> DataFrame:
    """(src, dst, n, p) first-order transition edge list: consecutive
    ``seq_col`` values within each ``partition_col`` ordered by
    ``order_cols``; p = n / out-degree mass of src (row-normalized).
    One shuffle on the partition key; normalization is a per-src
    window over the aggregated edge table (|edges| ≤ |node|², tiny).
    """
    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    seq = df.select(
        F.col(seq_col).alias("src"),
        F.lead(seq_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    e = seq.groupBy("src", "dst").agg(F.count("*").cast("double").alias("n"))
    wn = Window.partitionBy("src")
    return e.withColumn("p", F.col("n") / F.sum("n").over(wn))


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
) -> DataFrame:
    """PageRank with ``iterations`` unrolled power-iteration steps:
    r' = (1-d)/N + d·Σ_in r(src)·p(src→dst). ``edges`` must carry
    (src, dst, p) row-normalized transition probabilities (see
    :func:`transition_edges`). Dangling mass is dropped identically on
    every iteration (documented deviation from the redistribute-
    uniformly variant — row-normalized inputs built from observed
    transitions have no dangling nodes by construction).

    The full computation is ONE lazy plan — no driver-side rank state;
    N is the only collected scalar (bounded: the node count).
    """
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(1.0 / n_nodes).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("in_mass"))
        )
        ranks = (
            nodes.select(F.col(node_col).alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: list,
    max_depth: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Breadth-first shortest-path levels from a source set: (node,
    level) where level = minimum hop count, sources at 0. Completes
    the graph trio beside pagerank (influence) and dup_clusters
    (components): reachability/radius questions — lineage fan-out,
    contamination spread from a bad shard, link-distance features.

    Execution is level-synchronous frontier expansion: each round
    joins the frontier to the edge list on src (one hash shuffle of
    FRONTIER-sized rows — the edge side partitioning is reused round
    to round), anti-joins the visited set, and localCheckpoints the
    (small) frontier/visited frames so the plan never accretes across
    rounds. Rounds = min(max_depth, eccentricity); each round's cost
    is O(frontier out-edges), the PREGEL/GraphX BFS shape without the
    RDD API. Early-exits when the frontier empties.
    """
    from pyspark.sql import types as T

    spark = edges.sparkSession
    # persist: the edge lineage (often joins/distinct over fact tables)
    # must not re-execute every round
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).persist()
    node_t = edges.schema[src_col].dataType
    frontier = spark.createDataFrame(
        [(s,) for s in sources],
        T.StructType([T.StructField("node", node_t)]),
    ).withColumn("level", F.lit(0))
    visited = frontier.localCheckpoint()
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return visited


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle counting by degree orientation (the MapReduce
    classic — Suri & Vassilvitskii 2011 / Cohen 2009): orient every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, join oriented edges head-to-tail for wedges, then semi-join
    the closing edge.  Orientation makes every out-neighborhood
    O(sqrt(|E|)), so the wedge join never explodes on hubs — the
    unoriented join would square the max degree.

    Input: undirected edge list (src, dst), one row per edge with
    src < dst, no self-loops.  Output: one row —
    (n_nodes, n_edges, n_triangles, gcc) where gcc is the global
    clustering coefficient 3·triangles / wedges, computed integer-safe
    as 6·triangles / Σ_v deg(v)·(deg(v)−1) so both engines divide the
    same two BIGINTs.

    Scale: degree is one groupBy; the wedge join shuffles on the pivot
    node; the closing-edge check is a broadcast-or-shuffle semi-join on
    (lo, hi) — three shuffles total, each keyed, no cartesian."""
    e = edges.select("src", "dst")
    deg = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        e.join(deg.withColumnRenamed("v", "src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(deg.withColumnRenamed("v", "dst"), "dst")
        .withColumnRenamed("deg", "ddst")
    )
    lower_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )
    w1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a").alias("p"), F.col("b").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    closing = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    n_tri = tris.agg(F.count("*").alias("n_triangles"))
    stats = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1))
        .cast("bigint")
        .alias("dd"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("dd") > 0,
                    6.0 * F.col("n_triangles") / F.col("dd"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("gcc"),
        )
    )

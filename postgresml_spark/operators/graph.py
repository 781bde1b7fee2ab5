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

__all__ = ["transition_edges", "pagerank"]


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

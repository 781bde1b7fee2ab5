"""Graph operators: transition edges + unrolled PageRank."""

import pytest
from pyspark.sql import functions as F

from postgresml_spark.operators.graph import pagerank, transition_edges


@pytest.fixture(scope="module")
def chain(spark):
    # two users walking A->B->C and A->B->A
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
        (2, 1, "A"), (2, 2, "B"), (2, 3, "A"),
    ]
    return spark.createDataFrame(rows, ["uid", "step", "state"])


def test_transition_edges_row_normalized(chain):
    e = transition_edges(chain, "state", ["step"], "uid")
    rows = {(r["src"], r["dst"]): (r["n"], r["p"]) for r in e.collect()}
    assert rows[("A", "B")][0] == 2.0
    assert rows[("B", "C")] == (1.0, 0.5)
    assert rows[("B", "A")] == (1.0, 0.5)
    # out-probabilities sum to 1 per src
    sums = (
        e.groupBy("src").agg(F.sum("p").alias("s")).collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-12 for r in sums)


def test_pagerank_conserves_mass_without_dangling(chain):
    # strongly-connected 2-cycle: A<->B; total rank mass must stay 1
    edges = chain.sparkSession.createDataFrame(
        [("A", "B", 1.0), ("B", "A", 1.0)], ["src", "dst", "p"]
    )
    nodes = chain.sparkSession.createDataFrame([("A",), ("B",)], ["node"])
    r = pagerank(nodes, edges, iterations=5)
    vals = {row["node"]: row["r"] for row in r.collect()}
    assert abs(sum(vals.values()) - 1.0) < 1e-9
    # symmetric cycle → equal ranks
    assert abs(vals["A"] - vals["B"]) < 1e-12


def test_pagerank_sink_attracts_mass(chain):
    # A->B only (B re-feeds A to avoid dangling): B gets more than A
    edges = chain.sparkSession.createDataFrame(
        [("A", "B", 1.0), ("B", "A", 0.5), ("B", "B", 0.5)],
        ["src", "dst", "p"],
    )
    nodes = chain.sparkSession.createDataFrame([("A",), ("B",)], ["node"])
    vals = {
        row["node"]: row["r"]
        for row in pagerank(nodes, edges, iterations=10).collect()
    }
    assert vals["B"] > vals["A"]


def test_bfs_levels_shortest_paths_with_cycle(spark):
    from postgresml_spark.operators.graph import bfs_levels

    # a→b→c→a cycle, plus a→d, d→e; f unreachable
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e"),
         ("f", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["level"] for r in bfs_levels(edges, ["a"], max_depth=10).collect()}
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2}
    # multi-source: min distance over sources
    got2 = {r["node"]: r["level"]
            for r in bfs_levels(edges, ["a", "e"], max_depth=10).collect()}
    assert got2["e"] == 0 and got2["a"] == 0 and got2["b"] == 1


def test_triangle_count_known_graph(spark):
    """K4 minus one edge: 5 edges, 2 triangles; gcc = 6*2 / Σd(d-1) =
    12 / (2+6+6+2 → d=[2,3,3,2] → Σd(d-1)=2+6+6+2=16) = 0.75."""
    from postgresml_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], ["src", "dst"]
    )
    r = triangle_count(edges).collect()[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 5
    assert r["n_triangles"] == 2
    assert abs(r["gcc"] - 0.75) < 1e-9


def test_triangle_count_triangle_free(spark):
    from postgresml_spark.operators.graph import triangle_count

    # a 4-cycle has wedges but no triangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["src", "dst"]
    )
    r = triangle_count(edges).collect()[0]
    assert r["n_triangles"] == 0 and r["gcc"] == 0.0

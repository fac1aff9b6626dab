"""Integer fixed-point PageRank: distributed result must be
bit-identical to the driver-side reference (same arithmetic)."""

from __future__ import annotations

from e_commerce_data_pipeline_spark.operators.graph import (
    RANK_SCALE,
    pagerank,
    pagerank_reference,
)


def _run(spark, edge_list, iters=3):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: r["rank_q"] for r in pagerank(df, iters=iters).collect()
    }
    want = pagerank_reference(edge_list, iters=iters)
    return got, want


def test_matches_reference_on_small_graph(spark):
    # two triangles bridged by one edge, symmetrized
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = pairs + [(b, a) for a, b in pairs]
    got, want = _run(spark, edges)
    assert got == want
    # bridge endpoints (3, 4) carry the most rank
    top = sorted(got, key=lambda v: (-got[v], v))[:2]
    assert set(top) == {3, 4}


def test_star_center_dominates_and_mass_conserved(spark):
    center = 0
    pairs = [(center, i) for i in range(1, 9)]
    edges = pairs + [(b, a) for a, b in pairs]
    got, want = _run(spark, edges, iters=4)
    assert got == want
    assert got[center] == max(got.values())
    # floor losses only: total mass within |V| units per round of SCALE
    assert 0 < sum(got.values()) <= RANK_SCALE


def test_duplicate_and_self_edges_ignored(spark):
    pairs = [(1, 2), (2, 3), (1, 3)]
    edges = pairs + [(b, a) for a, b in pairs]
    noisy = edges * 3 + [(1, 1), (2, 2)]
    got, want = _run(spark, noisy, iters=2)
    clean_got, _ = _run(spark, edges, iters=2)
    assert got == want == clean_got

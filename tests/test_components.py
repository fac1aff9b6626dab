"""Connected components / dedup group resolution: exact agreement with
a union-find reference, chain convergence, singleton handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    comp = {}
    for i in n_ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


import pytest


@pytest.mark.parametrize("driver_max_edges", [0, 2_000_000])
def test_components_match_union_find(spark, driver_max_edges):
    # two triangles bridged by one edge + an isolated pair + singletons;
    # both execution strategies (distributed loop / driver union-find)
    # must produce the identical labeling
    edges = [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12),
             (20, 21), (7, 7)]
    ids = sorted({x for e in edges for x in e} | {30, 31})
    exp = _union_find(ids, edges)

    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    vdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = connected_components(
        edf, vertices=vdf, id_col="doc_id", driver_max_edges=driver_max_edges
    )
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == exp


def test_components_match_union_find_hypothesis(spark):
    """Derandomized hypothesis sweep (round 15): random edge lists
    over a small id domain — dense multi-edges, self-loops, cycles,
    stars, disconnected singletons — must label identically to the
    union-find reference under BOTH execution strategies."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ids_dom = st.integers(min_value=0, max_value=14)

    @settings(
        max_examples=6,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(st.tuples(ids_dom, ids_dom), min_size=1, max_size=20),
        st.sampled_from([0, 2_000_000]),
    )
    def run(edges, driver_max_edges):
        ids = sorted({x for e in edges for x in e} | {90, 91})
        exp = _union_find(ids, edges)
        edf = spark.createDataFrame(edges, "a_id long, b_id long")
        vdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = connected_components(
            edf,
            vertices=vdf,
            id_col="doc_id",
            driver_max_edges=driver_max_edges,
        )
        got = {r["id"]: r["component"] for r in out.collect()}
        assert got == exp, (edges, driver_max_edges)

    run()


def test_long_chain_converges_in_log_rounds(spark):
    # worst case for plain label propagation: a path graph
    # (diameter = n-1) needs ~n rounds; with pointer jumping the label
    # trees halve in depth per round, so 31 vertices settle well within
    # 6 iterations of the distributed loop.
    n = 31
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    out = connected_components(edf, max_iters=6, driver_max_edges=0)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}


def test_nonconvergence_warns(spark):
    edges = [(i, i + 1) for i in range(15)]
    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(edf, max_iters=1, driver_max_edges=0).collect()


def test_dedup_groups_contract(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (5, 6, 0.7)],
        "a_id long, b_id long, jaccard double",
    )
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    out = dedup_groups(pairs, corpus, id_col="doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 7  # every corpus doc appears exactly once
    assert {by_id[i]["group_id"] for i in (1, 2, 3)} == {1}
    assert {by_id[i]["group_id"] for i in (5, 6)} == {5}
    assert by_id[4]["group_id"] == 4 and by_id[4]["group_size"] == 1
    canon = {r["doc_id"] for r in out if r["is_canonical"]}
    assert canon == {1, 4, 5, 7}
    assert by_id[1]["group_size"] == 3 and by_id[6]["group_size"] == 2
    # keeping canonical rows yields exactly one survivor per group
    survivors = [r for r in out if r["is_canonical"]]
    assert len(survivors) == len({r["group_id"] for r in out})

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


def test_components_match_union_find(spark):
    # two triangles bridged by one edge + an isolated pair + singletons
    edges = [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12),
             (20, 21), (7, 7)]
    ids = sorted({x for e in edges for x in e} | {30, 31})
    exp = _union_find(ids, edges)

    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    vdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = connected_components(edf, vertices=vdf, id_col="doc_id")
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == exp


def test_long_chain_converges(spark):
    # worst case for label propagation: a path graph (diameter = n-1).
    # max_iters must bound it; with enough rounds the min label (0)
    # reaches the far end.
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "a_id long, b_id long")
    out = connected_components(edf, max_iters=n)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}


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

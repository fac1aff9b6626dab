"""IVF ANN: determinism, probe-bounded candidate sets, recall vs the
exact brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.catalog import load_table
from e_commerce_data_pipeline_spark.operators.ivf import (
    build_ivf_index,
    ivf_topk,
    train_centroids,
)
from e_commerce_data_pipeline_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_training_is_deterministic(spark, emb):
    c1 = train_centroids(emb, n_centroids=8, n_iters=2)
    c2 = train_centroids(emb, n_centroids=8, n_iters=2)
    assert (c1 == c2).all()


def test_index_covers_corpus(spark, emb):
    cents = train_centroids(emb, n_centroids=8, n_iters=2)
    idx = build_ivf_index(emb, cents)
    assert idx.count() == emb.count()
    n_clusters = idx.select("cluster").distinct().count()
    assert 1 < n_clusters <= 8


def test_recall_vs_bruteforce(spark, emb):
    cents = train_centroids(emb, n_centroids=8, n_iters=3)
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    # probing every list == exact search (sanity ceiling)
    full = ivf_topk(emb, queries, cents, k=5, nprobe=8)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    full_set = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_set == exact_set
    # partial probing trades recall for cost but must stay useful
    approx = ivf_topk(emb, queries, cents, k=5, nprobe=4)
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(approx_set & exact_set) / len(exact_set)
    assert recall >= 0.3, f"recall {recall}"


def test_fast_path_equals_portable(spark, emb):
    """The Arrow float64 matmul path must agree row-for-row with the
    native-expression portable path (same assignment, probe order, and
    rounded sims) — this is what licenses diffing the fast path
    against the double-precision DuckDB oracle in q46."""
    from e_commerce_data_pipeline_spark.operators.ivf import ivf_topk_portable

    cents = train_centroids(emb, n_centroids=8, n_iters=2)
    queries = emb.filter(F.col("vec_id") < 10)
    fast = ivf_topk(emb, queries, cents, k=5, nprobe=4)
    port = ivf_topk_portable(emb, queries, cents, k=5, nprobe=4)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, port.collect())
    )


def test_fast_path_equals_portable_hypothesis(spark):
    """Derandomized hypothesis agreement sweep (the round-15 tfidf
    lesson): integer-grid vectors ({-1,0,1} components) make exact
    cosine TIES common, so every tie-break rule — first-max argmax
    assignment, (sim DESC, centroid ASC) probing, (sim DESC,
    neighbor ASC) final rank — gets exercised where the fixture
    corpus (generic floats) never ties."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from e_commerce_data_pipeline_spark.operators.ivf import (
        ivf_topk_portable,
    )

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(
                st.sampled_from([-1.0, 0.0, 1.0]), min_size=8, max_size=8
            ).filter(lambda v: any(x != 0.0 for x in v)),
            min_size=6,
            max_size=18,
        ),
        st.integers(min_value=2, max_value=4),
    )
    def run(vecs, nprobe):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v] * 8) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )  # tile 8 -> dim 64, ties preserved
        cents = train_centroids(df, n_centroids=4, n_iters=2)
        queries = df.filter(F.col("vec_id") < 3)
        fast = ivf_topk(df, queries, cents, k=3, nprobe=nprobe)
        port = ivf_topk_portable(df, queries, cents, k=3, nprobe=nprobe)
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, port.collect())
        ), (vecs, nprobe)

    run()


def test_matrix_topk_equals_hof_topk(spark, emb):
    """The mapInPandas matrix kNN must return exactly the native
    column-expression kNN's results."""
    from e_commerce_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_matrix,
    )

    queries = emb.filter(F.col("vec_id") < 15)
    a = {(r["query_id"], r["rk"]): (r["neighbor_id"], r["sim"]) for r in cosine_topk(emb, queries, k=5).collect()}
    b = {(r["query_id"], r["rk"]): (r["neighbor_id"], r["sim"]) for r in cosine_topk_matrix(emb, queries, k=5).collect()}
    assert set(a) == set(b)
    for key in a:
        assert a[key][0] == b[key][0]
        assert abs(a[key][1] - b[key][1]) < 1e-9


def test_partitioned_index_probe_prunes_lists(spark, sf_dir, tmp_path):
    """The on-disk IVF index is partitioned by cluster and a probe scan
    prunes statically to the probed lists (PartitionFilters, and fewer
    partition dirs read than exist)."""
    import glob

    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.catalog import load_table
    from e_commerce_data_pipeline_spark.operators.ivf import (
        ivf_topk,
        probe_ivf_index,
        train_centroids,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, n_centroids=8, n_iters=2)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path)
    n_lists = len(glob.glob(path + "/cluster=*"))
    assert n_lists == 8

    queries = emb.filter(F.col("vec_id") < 3)
    out = probe_ivf_index(spark, path, queries, cents, k=5, nprobe=2)
    rows = out.collect()
    assert len(rows) == 15  # 3 queries x k

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index scan (neighbor_id/c_vec/cluster schema) must carry a
    # static IN partition filter over the probed clusters
    idx_scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "neighbor_id" in l
    ]
    assert idx_scans, plan
    assert any("PartitionFilters: [cluster" in l for l in idx_scans), idx_scans
    assert any(" IN (" in l for l in idx_scans), idx_scans

    # pruned probe matches the unpruned in-memory index path exactly
    full = ivf_topk(emb, queries, cents, k=5, nprobe=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, full.collect()))


def test_auto_nlist_sqrt_scaling(spark, emb):
    """n_centroids='auto' sizes the codebook ~sqrt(n) (the round-14
    scale-probe knob) and equals the explicitly-sized training run
    bit-for-bit (same seed, same iterations)."""
    import math

    from e_commerce_data_pipeline_spark.operators.ivf import auto_nlist

    assert auto_nlist(0) == 4
    assert auto_nlist(16) == 4
    assert auto_nlist(100) == 10
    assert auto_nlist(1_000_000) == 1000
    n = emb.count()
    want = max(4, math.isqrt(n))
    c_auto = train_centroids(emb, n_centroids="auto", n_iters=1)
    c_exp = train_centroids(emb, n_centroids=want, n_iters=1)
    assert c_auto.shape == (want, 64)
    assert (c_auto == c_exp).all()

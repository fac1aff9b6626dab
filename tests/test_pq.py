"""Product quantization (operators/pq.py): encode agrees with a numpy
reference, compression is lossy-but-faithful (ADC top-1 recall), and
the integer discipline holds end to end."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.catalog import load_table
from e_commerce_data_pipeline_spark.operators.pq import (
    MICRO,
    pq_adc_topk,
    pq_codes,
    quantize_micro,
    train_pq_codebooks_micro,
)


def test_pq_encode_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks_micro(emb)
    assert books.shape == (16, 16, 4) and books.dtype == np.int64
    got = {r["vec_id"]: list(r["codes"]) for r in pq_codes(emb, books).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:50]:
        xq = quantize_micro(r["embedding"])
        ref = []
        for s in range(16):
            xs = xq[s * 4 : (s + 1) * 4]
            d = ((books[s] - xs[None, :]) ** 2).sum(axis=1)
            ref.append(int(d.argmin()))
        assert got[r["vec_id"]] == ref, r["vec_id"]


def test_pq_adc_recall_against_exact_dot(spark, sf_dir):
    """Compression fidelity: for most queries the ADC top-1 must be
    inside the EXACT micro-dot top-5 (PQ is lossy; total rank
    agreement isn't expected, gross disagreement means broken
    codebooks or LUTs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks_micro(emb)
    pred = (F.col("vec_id") % 50) == 0
    adc = pq_adc_topk(emb, books, pred, k=5).collect()
    vecs = {
        r["vec_id"]: quantize_micro(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    hits = total = 0
    for q in sorted({r["query_id"] for r in adc}):
        dots = mat @ vecs[q]
        order = sorted(range(len(ids)), key=lambda j: (-dots[j], ids[j]))
        exact5 = [ids[j] for j in order if ids[j] != q][:5]
        adc1 = [r["neighbor_id"] for r in adc if r["query_id"] == q and r["rank"] == 1]
        total += 1
        hits += adc1[0] in exact5
    assert total >= 3
    assert hits / total >= 0.6, (hits, total)


def test_pq_score_is_exact_integer_lut_sum(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks_micro(emb)
    pred = (F.col("vec_id") % 100) == 0
    out = pq_adc_topk(emb, books, pred, k=3).collect()
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_codes(emb, books).collect()}
    qs = {
        r["vec_id"]: quantize_micro(r["embedding"])
        for r in emb.filter(pred).select("vec_id", "embedding").collect()
    }
    for r in out:
        qq = qs[r["query_id"]]
        s = 0
        for sub in range(16):
            qsub = qq[sub * 4 : (sub + 1) * 4]
            v = (books[sub] @ qsub)[codes[r["neighbor_id"]][sub]] / MICRO
            s += int(np.sign(v) * np.floor(np.abs(v) + 0.5))
        assert r["score_micro"] == s, (r, s)


def test_ivfpq_prunes_index_scan_and_subsets_adc(spark, sf_dir):
    """q185's operator: the index scan must carry PartitionFilters on
    cluster (static pruning), and every returned (query, neighbor,
    score) must agree with exhaustive ADC — IVF only FILTERS
    candidates, it must never change a survivor's score."""
    import os

    from e_commerce_data_pipeline_spark.operators.ivf import (
        train_centroids,
        write_ivf_index,
    )
    from e_commerce_data_pipeline_spark.operators.pq import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks_micro(emb)
    cents = train_centroids(emb, n_centroids=8, n_iters=2)
    path = f"/tmp/pq_ivf_idx_test_{os.getpid()}"
    write_ivf_index(emb, cents, path)
    out = ivfpq_adc_topk(
        spark, path, emb, books, F.col("vec_id") < 10, cents, k=5, nprobe=4
    )
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in line and "cluster" in line
        for line in plan.splitlines()
    )
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score_micro"]
        for r in pq_adc_topk(
            emb, books, F.col("vec_id") < 10, k=10**9
        ).collect()
    }
    assert len({r["query_id"] for r in rows}) >= 3
    for r in rows:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["score_micro"]

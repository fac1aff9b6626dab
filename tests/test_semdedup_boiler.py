"""SemDeDup (dedup.semdedup) vs a brute-force reference, and
boilerplate_ngrams (text.boilerplate_ngrams) invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_properties import _spark_round


def _mk_index(spark, vecs, centroids):
    """Build the (neighbor_id, cluster, c_vec) frame semdedup consumes,
    assigning by max cosine like ivf.build_ivf_index does."""
    cu = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(vecs):
        nv = v / np.linalg.norm(v)
        c = int(np.argmax(cu @ nv))
        rows.append((i, c, [float(x) for x in nv]))
    return spark.createDataFrame(
        rows, "neighbor_id int, cluster int, c_vec array<double>"
    )


def _brute_semdedup(vecs, centroids, tau):
    """O(n^2) reference: rank per cluster by centroid cosine (id
    tiebreak), drop when any higher-ranked cluster-mate rounds to
    >= tau."""
    cu = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cl = np.argmax(nv @ cu.T, axis=1)
    keep = {}
    for c in set(cl.tolist()):
        ids = [i for i in range(len(vecs)) if cl[i] == c]
        ids.sort(key=lambda i: (-float(nv[i] @ cu[c]), i))
        for rk, i in enumerate(ids):
            # mirror the operator's F.round(sim, 6) exactly (HALF_UP
            # on the shortest-decimal rendering) — Python round() is
            # banker's and diverges at exact .5e-6 boundaries (the
            # r13 Theil-Sen class; see test_properties._spark_round)
            sims = [
                _spark_round(float(nv[i] @ nv[j]), 6)
                for j in ids[:rk]
            ]
            keep[i] = (max(sims) if sims else -1.0) < tau
    return keep


def test_semdedup_matches_bruteforce(spark):
    from e_commerce_data_pipeline_spark.operators.dedup import semdedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 8))
    # inject near-duplicate chains: 10 jittered copies of 5 seeds
    dups = base[:5].repeat(2, axis=0) + 0.01 * rng.standard_normal((10, 8))
    vecs = np.vstack([base, dups])
    cents = rng.standard_normal((4, 8))
    got = {
        r["vec_id"]: bool(r["keep"])
        for r in semdedup(_mk_index(spark, vecs, cents), cents, tau=0.9).collect()
    }
    want = _brute_semdedup(vecs, cents, 0.9)
    assert got == want
    assert not all(got.values())  # the jittered copies produced drops
    assert any(got.values())


def test_semdedup_cluster_representative_always_kept(spark):
    from e_commerce_data_pipeline_spark.operators.dedup import semdedup

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8))
    cents = rng.standard_normal((3, 8))
    out = semdedup(_mk_index(spark, vecs, cents), cents, tau=0.5).collect()
    for r in out:
        if r["rk"] == 1:
            assert r["keep"] and r["max_prior_sim"] == -1.0


def test_boilerplate_flags_repeated_spans(spark):
    from e_commerce_data_pipeline_spark.operators.text import boilerplate_ngrams

    footer = "subscribe to our newsletter for updates"
    docs = [(i, f"unique words {i} alpha beta gamma delta {footer}") for i in range(6)]
    docs += [(10, "entirely distinct content with no repeats at all here")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["doc_id"]: r for r in boilerplate_ngrams(df, n=4, min_df=3).collect()}
    assert out[10]["n_boiler"] == 0 and out[10]["keep"]
    for i in range(6):
        assert out[i]["n_boiler"] >= 3  # the footer 4-grams recur in all 6
    assert not out[0]["keep"]  # short docs dominated by the shared footer


def test_boilerplate_empty_and_short_docs(spark):
    from e_commerce_data_pipeline_spark.operators.text import boilerplate_ngrams

    df = spark.createDataFrame(
        [(0, ""), (1, "one two three"), (2, "a b c d e f g h")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_ngrams(df, n=4, min_df=2).collect()}
    assert out[0]["n_shingles"] == 0 and out[0]["keep"]
    assert out[1]["n_shingles"] == 0 and out[1]["keep"]  # < n tokens
    assert out[2]["n_shingles"] == 5 and out[2]["n_boiler"] == 0


def test_langid_profiles_and_classification_deterministic(spark):
    from e_commerce_data_pipeline_spark.operators.text import (
        langid_ngram_classify,
    )

    docs = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        word = "zebra quokka" if lang == "aa" else "matrix vector"
        docs.append((i, f"{word} common filler words here {i}", lang))
    df = spark.createDataFrame(docs, "doc_id int, text string, lang string")
    out = langid_ngram_classify(df, n=3, top_k=10, train_frac=0.5)
    rows = out.collect()
    # every held-out doc classified exactly once, score >= 0
    assert len(rows) == len({r["doc_id"] for r in rows}) > 0
    assert all(r["score"] >= 0 for r in rows)
    # the lang-specific words dominate the profiles -> high accuracy
    acc = sum(r["lang"] == r["pred_lang"] for r in rows) / len(rows)
    assert acc >= 0.9
    # determinism: a second run returns the identical verdicts
    again = {r["doc_id"]: r["pred_lang"]
             for r in langid_ngram_classify(df, n=3, top_k=10, train_frac=0.5).collect()}
    assert again == {r["doc_id"]: r["pred_lang"] for r in rows}


def test_minhash_calibration_identical_and_disjoint(spark):
    from e_commerce_data_pipeline_spark.operators.dedup import (
        minhash_jaccard_calibration,
    )

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, text_a),
        (2, text_a),  # identical twin: must pair with 8/8 slots, J=1
        (3, "totally different words appear in this one here"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = {(r["a_id"], r["b_id"]): r
            for r in minhash_jaccard_calibration(df).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["n_eq_slots"] == 8 and r["jaccard6"] == 1.0
    # disjoint doc never collides with the twins
    assert not any(3 in k for k in rows)

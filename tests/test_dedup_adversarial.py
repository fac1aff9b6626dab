"""Adversarial-corpus stress for the dedup family (VERDICT r4 #8):
pathological shingle/bucket skew must keep candidate generation
bounded — the 25x self-union probe in PERF.md tested near-dup density,
these corpora test the two blowup modes it didn't:

1. stop-shingle blowup: every doc shares one boilerplate n-gram, so an
   uncut shared-shingle join degenerates to all-pairs; ``max_shingle_df``
   must cut the hot shingle and leave only true-group candidates.
2. hot LSH bucket: a large clique of identical docs lands in ONE band
   bucket; candidates must be exactly the clique pairs (sum bucket^2,
   never corpus^2) through an equi-join, with AQE skew-join enabled in
   the session so a 100TB-scale hot bucket splits at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:04d}", t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )


def test_stop_shingle_blowup_bounded_by_df_cut(spark):
    # 300 docs all opening with the same boilerplate 3-gram; 10 groups
    # of 3 additionally share a distinctive 3-gram tail, the rest are
    # vocabulary-disjoint. All-pairs through the boilerplate shingle
    # would be C(300,2) = 44850 candidates.
    texts = []
    for i in range(300):
        grp = i // 3 if i < 30 else None
        tail = (
            f"group{grp}x group{grp}y group{grp}z"
            if grp is not None
            else f"u{i}a u{i}b u{i}c"
        )
        texts.append(f"the quick brown {tail}")
    docs = _docs(spark, texts)

    uncut = ngram_jaccard_pairs(docs, n=3, threshold=0.0)
    n_uncut = uncut.count()
    assert n_uncut == 300 * 299 // 2  # the blowup is real on this corpus

    cut = ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_shingle_df=5)
    got = {
        (r.a_id, r.b_id)
        for r in cut.select("a_id", "b_id").collect()
    }
    want = {
        (f"d{3 * g + i:04d}", f"d{3 * g + j:04d}")
        for g in range(10)
        for i in range(3)
        for j in range(i + 1, 3)
    }
    # df-cut leaves exactly the true-group pairs: 10 * C(3,2) = 30
    assert got == want, (len(got), len(want))


def test_hot_lsh_bucket_candidates_are_clique_bounded(spark):
    # 50 identical docs (one hot band bucket per band) + 100 docs with
    # pairwise-disjoint vocabularies (no bucket collisions: a band key
    # is 2 independent 64-bit min-hashes, equality odds ~2^-128/pair).
    clique = ["alpha beta gamma delta epsilon zeta"] * 50
    others = [f"w{i}a w{i}b w{i}c w{i}d w{i}e" for i in range(100)]
    docs = _docs(spark, clique + others)

    cand = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    cand.collect()
    plan = cand._jdf.queryExecution().executedPlan().toString()
    # candidate join must stay an equi-join on (band, key) even with
    # the degenerate bucket — never a nested-loop/cross expansion
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    n = cand.count()
    assert n == 50 * 49 // 2, n  # exactly the clique pairs: sum bucket^2

    # the clique pairs are among the identical docs only
    ids = {r.a_id for r in cand.collect()} | {r.b_id for r in cand.collect()}
    assert ids <= {f"d{i:04d}" for i in range(50)}

    # runtime skew handling for a 100TB-scale hot bucket is config, not
    # plan shape at this size: the tuned session must ship it enabled
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

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


def test_prefix_filter_is_lossless_and_prunes_candidates(spark):
    """PPJoin prefix filtering must (a) return EXACTLY the pairs the
    full shared-shingle join qualifies — lossless, unlike the df-cut —
    and (b) generate strictly fewer candidate pairs than shingle
    co-occurrence on a corpus where docs share mid-frequency shingles
    but differ in their rare (prefix) units."""
    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.operators.dedup import (
        doc_shingles,
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    # 40 docs: all share one mid-df phrase (co-occurrence pairs every
    # pair: C(40,2) = 780), but only 5 clone-pairs reach jaccard 0.5
    texts = []
    for i in range(40):
        shared = "lorem ipsum dolor sit"
        uniq = f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f"
        if i < 10 and i % 2 == 1:
            uniq = f"u{i-1}a u{i-1}b u{i-1}c u{i-1}d u{i-1}e u{i-1}f"
        texts.append(f"{shared} {uniq}")
    docs = _docs(spark, texts)

    ref = {
        (r.a_id, r.b_id, r.n_inter)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    got = {
        (r.a_id, r.b_id, r.n_inter)
        for r in prefix_filter_jaccard_pairs(docs, threshold_pct=50).collect()
    }
    assert got == ref and len(got) == 5, (len(got), len(ref))

    # candidate volume: full co-occurrence pairs vs prefix-join pairs
    sh = doc_shingles(docs, "doc_id", "text", 3)
    full_pairs = (
        sh.select(F.col("id").alias("a"), "shingle")
        .join(sh.select(F.col("id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    assert full_pairs == 40 * 39 // 2  # the blowup the prefix avoids

    from e_commerce_data_pipeline_spark.operators.dedup import (
        _prefix_candidates,
        prefix_sorted_docs,
    )

    n_cand = _prefix_candidates(
        prefix_sorted_docs(docs), threshold_pct=50
    ).count()
    # at t=0.5 each 9-shingle doc's prefix is its 5 rarest shingles —
    # the shared mid-df phrase never enters, so candidates collapse
    # from 780 co-occurring pairs to (at most a few over) the 5 clones
    assert n_cand < full_pairs / 10, n_cand
    assert n_cand >= 5


def test_prefix_filter_lossless_hypothesis(spark):
    """Derandomized hypothesis differential (house rule, the round-15
    tfidf lesson): random tiny-alphabet corpora — maximum shingle
    sharing and tie pressure in the canonical (df, shingle) order —
    must give the PPJoin prefix filter exactly the brute
    shared-shingle join's pairs at several thresholds, including the
    integer-ceil prefix-length boundary cases random |x| hits."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from e_commerce_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    tok = st.sampled_from(["aa", "bb", "cc", "dd"])

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(tok, min_size=3, max_size=9),
            min_size=2,
            max_size=10,
        ),
        st.sampled_from([20, 34, 50, 67, 80]),
    )
    def run(doc_toks, pct):
        docs = _docs(spark, [" ".join(ts) for ts in doc_toks])
        ref = sorted(
            (r.a_id, r.b_id, r.n_inter, r.jaccard)
            for r in ngram_jaccard_pairs(
                docs, threshold=pct / 100.0
            ).collect()
        )
        got = sorted(
            (r.a_id, r.b_id, r.n_inter, r.jaccard)
            for r in prefix_filter_jaccard_pairs(
                docs, threshold_pct=pct
            ).collect()
        )
        assert got == ref, (doc_toks, pct)

    run()


def test_simhash_pigeonhole_lossless_hypothesis(spark):
    """The simhash chunk blocking's pigeonhole claim, fuzzed
    (round 15): with n_blocks > max_hamming, any pair within the
    Hamming budget shares >= 1 exact chunk, so the blocked join must
    return EXACTLY the brute all-pairs set. The q29 oracle replays
    the same blocking in SQL, so this differential — blocked vs a
    driver-side brute over the signature table — is the only
    independent check of the losslessness argument. Tiny-alphabet
    corpora keep signatures correlated (small Hamming distances
    actually occur)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from e_commerce_data_pipeline_spark.operators.dedup import (
        simhash_pairs,
        simhash_table,
    )

    tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])

    @settings(
        max_examples=6,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(tok, min_size=1, max_size=7, unique=True),
            min_size=2,
            max_size=10,
        ),
        st.sampled_from([(3, 4), (1, 2), (7, 8)]),
    )
    def run(doc_toks, cfg):
        max_h, n_blocks = cfg
        docs = _docs(spark, [" ".join(ts) for ts in doc_toks])
        sigs = {
            r["id"]: r["sh"] for r in simhash_table(docs).collect()
        }
        ids = sorted(sigs)
        brute = sorted(
            (a, b, sum(x != y for x, y in zip(sigs[a], sigs[b])))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if sum(x != y for x, y in zip(sigs[a], sigs[b])) <= max_h
        )
        got = sorted(
            (r["a_id"], r["b_id"], r["hamming"])
            for r in simhash_pairs(
                docs, max_hamming=max_h, n_blocks=n_blocks
            ).collect()
        )
        assert got == brute, (doc_toks, cfg)

    run()


def test_embedding_near_dup_auto_planes(spark):
    """n_planes='auto' derives the plane count from the corpus size
    (the round-14 scale-probe knob: log2 growth keeps bucket
    occupancy flat) and matches the explicitly-configured run
    exactly at the derived count."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.dedup import (
        auto_lsh_planes,
        embedding_near_dup,
    )

    # threshold shape: smallest p with n / 2^p <= 128, floor 4, cap 24
    assert auto_lsh_planes(0) == 4
    assert auto_lsh_planes(128) == 4
    assert auto_lsh_planes(2000) == 4     # the sf0.1 corpus -> q59 default
    assert auto_lsh_planes(20000) == 8    # the 10x probe's measured-good size
    assert auto_lsh_planes(10**12) == 24  # capped
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 64))
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(64)  # one near-dup pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = embedding_near_dup(df, dim=64, n_planes="auto").collect()
    exp = embedding_near_dup(
        df, dim=64, n_planes=auto_lsh_planes(60)
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert any({r["a_id"], r["b_id"]} == {3, 7} for r in got)


def test_auto_lsh_tables_and_strict_knob_strings(spark):
    """auto_lsh_tables holds the LSH recall identity (1-(1-P)^t >=
    recall at P=(1-theta/pi)^p); unknown knob strings fail fast."""
    import math

    import pytest

    from e_commerce_data_pipeline_spark.operators.dedup import (
        auto_lsh_tables,
        embedding_near_dup,
    )

    for p, sim, recall in [(4, 0.9, 0.9), (8, 0.9, 0.9), (8, 0.4, 0.9)]:
        t = auto_lsh_tables(p, sim, recall)
        pt = (1 - math.acos(sim) / math.pi) ** p
        assert 1 - (1 - pt) ** t >= recall
        if t > 1:  # minimal: one fewer table must miss the target
            assert 1 - (1 - pt) ** (t - 1) < recall
    # near-dup regime stays cheap, near-threshold is honest-expensive
    assert auto_lsh_tables(8, 0.9, 0.9) == 7
    assert auto_lsh_tables(8, 0.4, 0.9) > 50
    assert auto_lsh_tables(1, 1.0, 0.99) == 1
    df = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="auto"):
        embedding_near_dup(df, dim=64, n_planes="Auto")
    with pytest.raises(ValueError, match="auto"):
        embedding_near_dup(df, dim=64, n_tables="all")


def test_embedding_near_dup_auto_tables_coscale(spark):
    """n_tables='auto' (round 15) wires auto_lsh_tables to the
    RESOLVED plane count: at auto planes the co-scaled run matches
    the explicitly-configured (planes, tables) pair exactly, and
    recovers a true near-dup pair that the fixed 2-table default
    can miss at higher plane counts."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.dedup import (
        auto_lsh_planes,
        auto_lsh_tables,
        embedding_near_dup,
    )

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((300, 32))
    vecs[11] = vecs[5] + 0.01 * rng.standard_normal(32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    p = auto_lsh_planes(300)
    t = auto_lsh_tables(p)
    got = embedding_near_dup(
        df, dim=32, n_planes="auto", n_tables="auto"
    ).collect()
    exp = embedding_near_dup(
        df, dim=32, n_planes=p, n_tables=t
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert any({r["a_id"], r["b_id"]} == {5, 11} for r in got)


def test_train_centroids_strict_knob_string(spark):
    import pytest

    from e_commerce_data_pipeline_spark.operators.ivf import train_centroids

    df = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="auto"):
        train_centroids(df, n_centroids="16")

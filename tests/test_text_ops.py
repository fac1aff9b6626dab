"""Edge-case tests for text operators: empty/whitespace docs, token
counting semantics, fingerprint invariance."""

from __future__ import annotations

from e_commerce_data_pipeline_spark.operators import text as T
from e_commerce_data_pipeline_spark.operators.dedup import exact_dedup, shingles


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "Hello,  World!  "),
            (2, ""),
            (3, "   "),
            (4, "the quick brown fox and the lazy dog in a field"),
            (5, "hello world"),
            (6, "WORLD   hello"),
            (7, "a b"),
        ],
        "doc_id int, text string",
    )


def test_token_count_edges(spark):
    rows = {
        r["doc_id"]: r["n"]
        for r in _docs(spark).select("doc_id", T.token_count("text").alias("n")).collect()
    }
    assert rows[1] == 2  # 'hello,' 'world!'
    assert rows[2] == 0 and rows[3] == 0  # empty / whitespace-only
    assert rows[4] == 11


def test_bpe_token_count_splits_symbols(spark):
    rows = {
        r["doc_id"]: r["n"]
        for r in _docs(spark)
        .select("doc_id", T.token_count_bpe("text").alias("n"))
        .collect()
    }
    assert rows[1] == 4  # hello , world !
    assert rows[2] == 0


def test_bag_fingerprint_order_insensitive(spark):
    fps = {
        r["doc_id"]: r["fp"]
        for r in _docs(spark)
        .select("doc_id", T.fingerprint_bag("text").alias("fp"))
        .collect()
    }
    assert fps[5] == fps[6]  # same token bag, different order/case/spacing
    assert fps[5] != fps[7]


def test_exact_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello worlds")],
        "doc_id int, text string",
    )
    groups = exact_dedup(df)
    n = {r["canonical_id"]: r["n_copies"] for r in groups.collect()}
    assert n[1] == 2 and n[3] == 1


def test_stopword_hits_and_english_guess(spark):
    df = _docs(spark)
    rows = {
        r["doc_id"]: (r["h"], r["g"])
        for r in df.select(
            "doc_id",
            T.stopword_hits("text").alias("h"),
            T.guess_is_english("text").alias("g"),
        ).collect()
    }
    assert rows[4][0] >= 4 and rows[4][1]  # the/and/in/a
    assert rows[5][0] == 0 and not rows[5][1]
    assert rows[2][0] == 0


def test_shingles_short_docs(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c"), (3, "a b c d")], "doc_id int, text string")
    rows = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", shingles("text", 3).alias("sh")).collect()
    }
    assert rows[1] == []  # shorter than n -> no shingles
    assert rows[2] == ["a b c"]
    assert rows[3] == ["a b c", "b c d"]


def test_quality_score_quartiles(spark):
    good = "the quick brown fox jumps over the lazy dog " * 5  # long, wordy
    df = spark.createDataFrame(
        [(1, good), (2, "!!! ??? ###"), (3, "")], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", T.doc_quality_score("text").alias("q")).collect()
    }
    assert rows[1] >= 0.75
    assert rows[2] <= 0.5
    assert rows[3] in (0.0, 0.25)  # empty: only the punct check can pass
    assert all(q * 4 == int(q * 4) for q in rows.values())  # exact quarters

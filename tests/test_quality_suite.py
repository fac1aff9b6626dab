"""Quality-suite compiler self-test: known-violation tables must produce
the expected per-expectation pass/fail and score (SURVEY §5.2 item 4)."""

from __future__ import annotations

from e_commerce_data_pipeline_spark.operators.quality import (
    compile_suite,
    expect_between,
    expect_distinct_ratio,
    expect_freshness,
    expect_in_set,
    expect_not_null,
    expect_row_count,
    expect_unique,
    quality_gate,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "2024-01-30 10:00:00"),
            (2, "b", 20.0, "2024-01-30 11:00:00"),
            (2, None, -5.0, "2024-01-30 12:00:00"),  # dup id, null, oob
            (4, "zz", 30.0, "2024-01-01 00:00:00"),  # bad category
        ],
        schema="id int, cat string, v double, ts_s string",
    ).selectExpr("id", "cat", "v", "cast(ts_s as timestamp) as ts")


def test_suite_compiles_to_one_row_with_expected_results(spark):
    df = _df(spark)
    suite = [
        expect_not_null("cat"),            # FAIL: 1 null
        expect_unique("id"),               # FAIL: one dup
        expect_in_set("cat", ["a", "b"]),  # FAIL: 'zz'
        expect_between("v", 0, 100),       # FAIL: -5
        expect_row_count(1, 100),          # PASS
        expect_distinct_ratio("id", 0.5, 1.0),  # PASS: 3/4
        expect_freshness("ts", 2, now="2024-01-30 13:00:00"),  # PASS
    ]
    row = compile_suite(df, suite).collect()[0]
    assert row["n_null_cat"] == 1
    assert row["n_dup_id"] == 1
    assert row["n_bad_cat"] == 1
    assert row["n_oob_v"] == 1
    assert row["n_rows"] == 4
    assert row["pass_row_count"] and row["pass_distinct_ratio_id"]
    assert row["pass_freshness_ts"]
    assert not row["pass_not_null_cat"]
    assert not row["pass_unique_id"]
    assert abs(row["quality_score"] - 3 / 7) < 1e-12


def test_quality_gate_threshold(spark):
    df = _df(spark)
    good_suite = [expect_row_count(1, 100), expect_between("v", -100, 100)]
    score, row, passed = quality_gate(df, good_suite, threshold=0.95)
    assert passed and score == 1.0
    bad_suite = good_suite + [expect_not_null("cat")]
    score, row, passed = quality_gate(df, bad_suite, threshold=0.95)
    assert not passed and abs(score - 2 / 3) < 1e-12


def test_single_scan_plan(spark):
    """The compiled suite must be ONE aggregate over ONE scan."""
    df = _df(spark)
    suite = [
        expect_not_null("cat"),
        expect_between("v", 0, 100),
        expect_row_count(1, 100),
    ]
    plan = compile_suite(df, suite)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("localrelation") + plan.lower().count("relation") <= 2


def test_violation_samples_reported(spark):
    """A3/A4: the suite reports the first violating values, not just
    counts (deterministic sorted-sample form)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("zz", -5.0), ("yy", 200.0), ("a", 2.0), ("xx", -7.0)],
        "cat string, v double",
    )
    row = compile_suite(
        df, [expect_in_set("cat", ["a", "b"]), expect_between("v", 0, 100)]
    ).collect()[0]
    assert row["n_bad_cat"] == 3
    assert row["bad_samples_cat"] == ["xx", "yy", "zz"]
    assert row["n_oob_v"] == 3
    assert row["oob_samples_v"] == [-7.0, -5.0, 200.0]


def test_compile_suite_n_passed_integer_matches_score(spark):
    """n_passed (round 7) must stay consistent with quality_score:
    score == n_passed / len(suite) exactly, and n_passed is the count
    of true pass_* flags."""
    from e_commerce_data_pipeline_spark.operators.quality import (
        compile_suite,
        expect_between,
        expect_not_null,
        expect_row_count,
        expect_unique,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, 7.0)], "id int, v double"
    )
    suite = [
        expect_not_null("id"),       # pass
        expect_unique("id"),         # fail (dup id=2)
        expect_between("v", 0, 10),  # fail (-1)
        expect_row_count(1, 100),    # pass
    ]
    row = compile_suite(df, suite).collect()[0]
    flags = [row[f"pass_{e.name}"] for e in suite]
    assert row["n_passed"] == sum(flags) == 2
    assert row["quality_score"] == row["n_passed"] / len(suite)

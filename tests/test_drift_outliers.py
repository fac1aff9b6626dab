"""PSI drift + robust median/MAD outliers: hand-computed references and
invariance properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.drift import psi_drift
from e_commerce_data_pipeline_spark.operators.quality import (
    robust_outlier_stats,
)


def test_psi_zero_for_identical_distributions(spark):
    # same histogram both periods -> p == q per bin -> every quantized
    # (p-q) term is exactly 0
    rows = [("g", b, cur) for b in range(4) for cur in (False, True) for _ in range(10 * (b + 1))]
    df = spark.createDataFrame(rows, "g string, bin int, cur boolean")
    out = psi_drift(df, "g", F.col("bin"), F.col("cur"), n_bins=4).collect()
    assert len(out) == 1
    assert out[0]["psi_micro2"] == 0 and out[0]["psi"] == 0.0
    assert out[0]["n_base"] == out[0]["n_cur"] == 100


def test_psi_matches_hand_formula_and_flags_shift(spark):
    # baseline mass in bin 0, current mass in bin 1 -> large PSI
    rows = [("g", 0, False)] * 90 + [("g", 1, False)] * 10 \
         + [("g", 0, True)] * 10 + [("g", 1, True)] * 90
    df = spark.createDataFrame(rows, "g string, bin int, cur boolean")
    got = psi_drift(df, "g", F.col("bin"), F.col("cur"), n_bins=2).collect()[0]

    def term(kb, kc, nb, nc):
        p, q = kb / (nb + 2.0), kc / (nc + 2.0)
        return round((p - q) * 1e6) * round(math.log(p / q) * 1e6)

    expected = term(91, 11, 100, 100) + term(11, 91, 100, 100)
    assert got["psi_micro2"] == expected
    assert got["psi"] > 1.0  # far beyond the 0.25 "shifted" alarm


def test_robust_outliers_hand_case(spark):
    # group of 11: ten values near 100, one wild value
    vals = [98, 99, 99, 100, 100, 100, 100, 101, 101, 102, 10000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, c long")
    row = robust_outlier_stats(df, "g", "c", k_sigma=3).collect()[0]
    # median = 100 -> med2 = 200; deviations |2c-200| = [4,2,2,0,0,0,0,2,2,4,19800]
    # median of dev2 = 2 -> mad4 = 4 (MAD = 1 cent)
    assert (row["med2"], row["mad4"]) == (200, 4)
    # outlier iff dev2*20000 > 3*14826*4 = 177912 -> dev2 > 8.9 -> only 10000
    assert (row["n"], row["n_outliers"]) == (11, 1)


def test_robust_outliers_zero_mad_flags_any_deviation(spark):
    # constant group: MAD = 0 -> every non-median value is an outlier
    df = spark.createDataFrame(
        [("g", 5)] * 9 + [("g", 6)], "g string, c long"
    )
    row = robust_outlier_stats(df, "g", "c").collect()[0]
    assert row["mad4"] == 0 and row["n_outliers"] == 1


def test_negative_samples_exclude_positives_and_are_layout_stable(spark):
    from e_commerce_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    pos_rows = [(u, i) for u in range(1, 21) for i in range(1, 6)]  # items 1-5 taken
    pos = spark.createDataFrame(pos_rows, "user long, item long")
    got = negative_samples(pos, "user", "item", n_items=50, k=3).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user"], []).append((r["slot"], r["item"]))
    assert set(by_user) == set(range(1, 21))
    taken = {i for _, i in pos_rows}
    for u, pairs in by_user.items():
        assert len(pairs) == 3
        assert all(1 <= it <= 50 and it not in taken for _, it in pairs)
        assert [s for s, _ in pairs] == sorted(s for s, _ in pairs)
    again = negative_samples(
        pos.repartition(7), "user", "item", n_items=50, k=3
    ).collect()
    assert {(r["user"], r["slot"], r["item"]) for r in again} == {
        (r["user"], r["slot"], r["item"]) for r in got
    }


def test_schema_drift_categories(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from e_commerce_data_pipeline_spark.operators.drift import schema_drift

    old = StructType([
        StructField("a", LongType(), False),
        StructField("b", StringType(), True),
        StructField("c", LongType(), True),
        StructField("d", LongType(), True),
    ])
    new = StructType([
        StructField("a", LongType(), True),       # relaxed
        StructField("b", LongType(), True),       # type changed
        StructField("d", LongType(), False),      # tightened
        StructField("e", StringType(), True),     # added; c removed
    ])
    got = {r["column"]: r["change"] for r in schema_drift(old, new)}
    assert got == {
        "a": "nullability_relaxed",
        "b": "type_changed",
        "c": "removed",
        "d": "nullability_tightened",
        "e": "added",
    }
    # DataFrame inputs work too, and identical schemas report nothing
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    assert schema_drift(df, df) == []

"""Monotone (isotonic) calibration — fit the best non-decreasing rate
curve over ordered bands, the standard post-hoc calibration step for
scores and the shape-constrained alternative to binning heuristics
(Barlow et al. 1972; equivalently scikit-learn's IsotonicRegression).

Instead of the sequential pool-adjacent-violators sweep (inherently
serial), the fit uses the MINIMAX closed form

    fitted(i) = max_{j <= i} min_{k >= i} avg(y over bands j..k)

which is pure relational algebra: prefix sums -> interval averages ->
two grouped extremes. Cost is O(B^3) pairs over the BAND table, and
bands are bounded by construction (quantity levels, price buckets,
score percentiles) — corpus-independent the same way q162's
calendar-bounded pair join is; the corpus itself is touched exactly
once by the banding aggregation.

Float discipline: every interval average is ONE double division of
two exact integer sums (the fixed_avg doctrine), so the interval-
average multiset is bit-identical across engines and min/max over it
— hence the fitted curve — is too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def integer_ewma(pairs, shift: int = 3):
    """Gap-filled INTEGER EWMA fold: sorted-or-not [(di, x)] pairs ->
    [(di, x, s)] over the full [min(di), max(di)] range with missing
    days as x = 0 and s_t = s_{t-1} + trunc((x_t - s_{t-1}) / 2^shift)
    (s_0 = x_0). The q174 recurrence, extracted so its boundary
    domains are property-testable: Python ints never overflow an
    intermediate at any input scale, and the truncate-toward-zero
    form mirrors DuckDB INTEGER // and Spark SQL ``div`` exactly
    (Python's bare // floors — the round-8 q174 lesson). Runs
    driver-side over the calendar-bounded daily artifact only."""
    assert pairs, "integer_ewma needs at least one (di, x) pair"
    by_di = dict(pairs)
    d0, d1 = min(by_di), max(by_di)
    div = 1 << shift
    out = []
    s = None
    for di in range(d0, d1 + 1):
        x = by_di.get(di, 0)
        if s is None:
            s = x
        else:
            r = x - s
            s = s + (r // div if r >= 0 else -((-r) // div))
        out.append((di, x, s))
    return out


def isotonic_fit(
    bands: DataFrame,
    x_col: str = "x",
    hits_col: str = "hits",
    n_col: str = "n",
) -> DataFrame:
    """(x, hits, n) band table -> (x, hits, n, emp_rate, fitted_rate)
    with fitted_rate the isotonic (non-decreasing in x) least-squares
    fit of hits/n weighted by n. The unpartitioned prefix window is
    deliberate: the input is the bounded band artifact, never the
    corpus."""
    b = bands.select(
        F.col(x_col).alias("x"),
        F.col(hits_col).cast("long").alias("hits"),
        F.col(n_col).cast("long").alias("n"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pre = b.withColumn("s", F.sum("hits").over(w)).withColumn(
        "nn", F.sum("n").over(w)
    )
    j = pre.select(
        F.col("x").alias("jx"),
        F.col("s").alias("sj"),
        F.col("nn").alias("nj"),
        F.col("hits").alias("hj"),
        F.col("n").alias("cj"),
    )
    k = pre.select(
        F.col("x").alias("kx"),
        F.col("s").alias("sk"),
        F.col("nn").alias("nk"),
    )
    iv = j.join(k, F.col("jx") <= F.col("kx")).select(
        "jx",
        "kx",
        (
            (F.col("sk") - F.col("sj") + F.col("hj"))
            / ((F.col("nk") - F.col("nj") + F.col("cj")) * F.lit(1.0))
        ).alias("a"),
    )
    i = b.select(F.col("x").alias("ix"))
    m1 = (
        iv.join(i, (F.col("jx") <= F.col("ix")) & (F.col("ix") <= F.col("kx")))
        .groupBy("jx", "ix")
        .agg(F.min("a").alias("mn"))
    )
    fit = m1.groupBy("ix").agg(F.max("mn").alias("fitted_rate"))
    return (
        b.join(fit, b.x == fit.ix)
        .select(
            "x",
            "hits",
            "n",
            (F.col("hits") / (F.col("n") * F.lit(1.0))).alias("emp_rate"),
            "fitted_rate",
        )
    )

"""Distribution-drift monitoring for data pipelines: Population
Stability Index (PSI) between two periods/populations of a binned
metric.

PSI = sum over bins of (p - q) * ln(p / q) — the standard score a
feature-store or training-data pipeline alarms on (rule of thumb:
< 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted). Counts use Laplace
smoothing (+1 per bin) so empty bins stay finite.

Float parity (the q64/q78/q97 discipline): p and q are double
divisions of exact integers (bit-identical cross-engine); the two
transcendental-touched factors are each quantized to integer
micro-units ONCE — round((p-q)*1e6) and round(ln(p/q)*1e6) — and the
per-bin contribution is their exact int64 product, summed as int64.
The reported PSI is that sum / 1e12, one final exact division.

Scale shape: ONE scan builds (group, bin, period) counts with map-side
partial aggregation; everything after runs on #groups x #bins rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    group_col: str,
    bin_col: Column,
    period_col: Column,
    n_bins: int,
) -> DataFrame:
    """Per-group PSI of ``bin_col``'s distribution between
    ``period_col`` = false (baseline, p) and true (current, q).

    ``bin_col`` must be an integer bucket in [0, n_bins); rows with a
    null bin or null period are ignored. Returns
    (group_col, n_base, n_cur, psi_micro2, psi) where ``psi_micro2``
    is the exact integer sum (micro^2 units) and ``psi`` the derived
    double — diff on either.
    """
    counts = (
        df.filter(bin_col.isNotNull() & period_col.isNotNull())
        .groupBy(
            F.col(group_col),
            bin_col.cast("int").alias("__bin"),
            period_col.cast("boolean").alias("__cur"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # dense (group x bin) grid so bins empty on one side still
    # contribute their smoothed term
    groups = counts.groupBy(group_col).agg(
        F.sum(F.when(~F.col("__cur"), F.col("__n")).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("__cur"), F.col("__n")).otherwise(0)).alias("n_cur"),
    )
    grid = groups.select(
        group_col,
        "n_base",
        "n_cur",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin"),
    )
    base = counts.filter(~F.col("__cur")).select(
        group_col, "__bin", F.col("__n").alias("__nb")
    )
    cur = counts.filter(F.col("__cur")).select(
        group_col, "__bin", F.col("__n").alias("__nc")
    )
    j = (
        grid.join(base, [group_col, "__bin"], "left")
        .join(cur, [group_col, "__bin"], "left")
        .select(
            group_col,
            "n_base",
            "n_cur",
            (F.coalesce(F.col("__nb"), F.lit(0)) + 1).alias("__kb"),
            (F.coalesce(F.col("__nc"), F.lit(0)) + 1).alias("__kc"),
        )
    )
    p = F.col("__kb") / (F.col("n_base") + F.lit(n_bins)).cast("double")
    q = F.col("__kc") / (F.col("n_cur") + F.lit(n_bins)).cast("double")
    contrib = (
        F.round((p - q) * 1_000_000).cast("long")
        * F.round(F.log(p / q) * 1_000_000).cast("long")
    )
    return (
        j.groupBy(group_col, "n_base", "n_cur")
        .agg(F.sum(contrib).alias("psi_micro2"))
        .select(
            group_col,
            "n_base",
            "n_cur",
            "psi_micro2",
            (F.col("psi_micro2") / F.lit(1e12)).alias("psi"),
        )
    )


def schema_drift(old_schema, new_schema) -> list:
    """Schema-drift report between two snapshots of a table: the
    metadata-level complement to ``psi_drift`` (value drift). Returns
    a plain list of dicts — this is driver-side metadata, no job runs.

    Categories:
    - ``added`` / ``removed``: column present in only one snapshot
    - ``type_changed``: same name, different dataType (a silent
      reader-breaker on parquet unions — the case quality gates must
      catch before a write lands in the lake)
    - ``nullability_relaxed``: required -> nullable (usually benign
      but contract-relevant); ``nullability_tightened`` the reverse

    Accepts StructType or anything with ``.schema`` (a DataFrame).
    """
    old = getattr(old_schema, "schema", old_schema)
    new = getattr(new_schema, "schema", new_schema)
    o = {f.name: f for f in old.fields}
    n = {f.name: f for f in new.fields}
    out = []
    for name in sorted(o.keys() - n.keys()):
        out.append({"column": name, "change": "removed",
                    "old": o[name].dataType.simpleString(), "new": None})
    for name in sorted(n.keys() - o.keys()):
        out.append({"column": name, "change": "added",
                    "old": None, "new": n[name].dataType.simpleString()})
    for name in sorted(o.keys() & n.keys()):
        fo, fn = o[name], n[name]
        if fo.dataType != fn.dataType:
            out.append({"column": name, "change": "type_changed",
                        "old": fo.dataType.simpleString(),
                        "new": fn.dataType.simpleString()})
        elif fo.nullable != fn.nullable:
            out.append({
                "column": name,
                "change": ("nullability_relaxed" if fn.nullable
                           else "nullability_tightened"),
                "old": str(fo.nullable), "new": str(fn.nullable),
            })
    return out

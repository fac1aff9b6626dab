"""Iterative graph operators: integer fixed-point PageRank.

PageRank over co-occurrence graphs (part co-purchase, doc link graphs)
is the canonical iterative operator a training-data pipeline needs for
importance weighting and crawl-frontier scoring. Spark has no built-in;
this is the composition-of-DataFrame-ops formulation: one cached,
pre-partitioned edge frame, and per iteration one |V|-row join
(ranks ⋈ degrees), one edge join keyed on the cached partitioning, and
one partial-aggregated groupBy — the standard distributed PageRank
shuffle pattern (Malewicz et al., Pregel, SIGMOD'10).

All arithmetic is INTEGER fixed-point: rank mass lives in
``RANK_SCALE`` units and per-edge shares use floor division, so the
result is bit-identical across engines, partitionings, and repeated
runs — a SQL engine unrolling the same iterations (the DuckDB oracle
does) reproduces every rank exactly. Floor losses leak a few units of
mass per vertex per round; ranking order is unaffected and
determinism is what matters for verification.

Scale: the edge frame is repartitioned by ``src`` once and cached, so
the per-iteration share join reuses that layout instead of
re-shuffling edges every round; only the |V|-row rank frame moves.
Degrees are computed on the same layout (no extra shuffle). Ranks are
``localCheckpoint``-ed per round to keep lineage flat over many
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(id, rank_q) after ``iters`` power iterations; rank_q is in
    RANK_SCALE units.

    ``edges`` is a directed edge list; it is deduplicated here. Every
    vertex must have out-degree >= 1 (always true for symmetrized
    co-occurrence graphs) — there is no dangling-mass redistribution.

    Exact update rule (all integer, '//' = floor division)::

        r0(v)     = RANK_SCALE // N
        share_k(u)= (damping_pct * r_k(u)) // (100 * deg(u))
        r_{k+1}(v)= (100-damping_pct)*RANK_SCALE // (100*N)
                    + sum_{u->v} share_k(u)
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition("src")
        .cache()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    n = deg.count()  # bounded: one long per distinct source vertex
    if n == 0:
        return deg.select(
            F.col("src").alias("id"), F.lit(0).cast("long").alias("rank_q")
        )
    teleport = (100 - damping_pct) * RANK_SCALE // (100 * n)
    ranks = deg.select(
        F.col("src").alias("id"),
        F.lit(RANK_SCALE // n).cast("long").alias("rank_q"),
    )
    for _ in range(iters):
        shares = (
            ranks.join(deg, ranks.id == deg.src)
            .select(
                "src",
                F.expr(
                    f"({damping_pct} * rank_q) div (100 * deg)"
                ).alias("share"),
            )
        )
        ranks = (
            e.join(shares, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
            .select(
                F.col("dst").alias("id"),
                (F.col("in_mass") + F.lit(teleport)).alias("rank_q"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_reference(edge_list, iters: int = 3, damping_pct: int = 85):
    """Driver-side integer reference implementation (tests only):
    identical arithmetic to :func:`pagerank`, plain Python dicts."""
    edges = sorted({(u, v) for u, v in edge_list if u != v})
    deg: dict = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(deg)
    if n == 0:
        return {}
    teleport = (100 - damping_pct) * RANK_SCALE // (100 * n)
    r = {u: RANK_SCALE // n for u in deg}
    for _ in range(iters):
        share = {u: (damping_pct * r[u]) // (100 * deg[u]) for u in r}
        nxt: dict = {}
        for u, v in edges:
            nxt[v] = nxt.get(v, 0) + share[u]
        r = {v: m + teleport for v, m in nxt.items()}
    return r

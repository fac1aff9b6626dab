"""Connected components over near-dup pair graphs (the dedup endgame).

Candidate generators (MinHash LSH, SimHash, embedding blocking) emit
*pairs*; deduplication needs *groups* — if A~B and B~C, one canonical
doc must represent {A, B, C} even though A and C never paired. That
closure is a connected-components problem on the pair graph.

Spark mapping: iterative min-label propagation. Every vertex starts
labeled with its own id; each round, a vertex adopts the minimum label
among itself and its neighbors (one equi-join edges x labels + one
groupBy(min) — both shuffle on vertex id, with map-side partial
aggregation). Convergence needs rounds ~ graph diameter; near-dup
graphs are unions of small dense clusters (diameter 1-3), so 2-4
rounds settle real corpora. Lineage is cut per round with
``localCheckpoint`` so the plan doesn't grow with iterations, and the
loop exits early on a zero-changes round (one count job per round —
a convergence check, not a data path).

For adversarial graphs (long chains, diameter ~ |V|) the
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log^2 n) rounds with the same join-shape per round; the propagation
loop here is the right default for dedup workloads where diameter is
structurally tiny.

The driver-side loop control (not the data) is the only non-declarative
part — the same structure Spark's own GraphFrames/Pregel uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iters: int = 25,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id
    reachable through the undirected edge set.

    ``vertices`` (optional) adds isolated vertices — docs with no
    near-dup pair become singleton components of themselves. They are
    attached by ONE left join after convergence, not dragged through
    the iterations: only edge-endpoint vertices (a small fraction of a
    deduplicated corpus) ever enter the propagation loop, so iteration
    cost scales with the pair graph, not the corpus.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    # fused init + first round: every endpoint appears as `u` in the
    # symmetrized edge set, so min(id, min neighbor) IS round 1 of the
    # propagation — one groupBy instead of an identity-label round
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("id"), F.least("u", "mn").alias("component"))
        .localCheckpoint()
    )

    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("v"), F.col("component").alias("v_comp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("v_comp").alias("nbr_min"))
            .select(F.col("u").alias("id"), "nbr_min")
        )
        # carry the moved flag inside the checkpointed frame: the
        # eager localCheckpoint materializes it anyway, so the
        # convergence check below is a limit(1) over checkpointed
        # blocks instead of a second join+count job per round
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                (
                    F.coalesce("nbr_min", "component") < F.col("component")
                ).alias("__moved"),
            )
            .localCheckpoint()
        )
        converged = not new_labels.filter("__moved").limit(1).count()
        labels = new_labels.drop("__moved")
        if converged:
            break
    sym.unpersist()
    if not converged:
        # a silent exit here would return split/non-minimal components
        # (graph diameter > max_iters) and dedup_groups would pick the
        # wrong canonical survivors with no signal
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iters} "
            "iterations; labels may be split — raise max_iters "
            "(propagation needs ~graph-diameter rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    if vertices is not None:
        labels = (
            vertices.select(F.col(id_col).alias("id"))
            .distinct()
            .join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    return labels


def dedup_groups(
    pairs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    src: str = "a_id",
    dst: str = "b_id",
) -> DataFrame:
    """Resolve near-dup pairs into keep/drop groups over the corpus.

    Returns (id_col, group_id, group_size, is_canonical): group_id is
    the minimum doc id of the duplicate cluster (so the canonical
    survivor is deterministic — exactly the row where id == group_id),
    and docs with no pair form singleton groups. Downstream keeps
    ``is_canonical`` rows — the standard LLM-corpus dedup contract.
    """
    comp = connected_components(
        pairs, src=src, dst=dst, vertices=corpus, id_col=id_col
    )
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("group_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )

"""Connected components over near-dup pair graphs (the dedup endgame).

Candidate generators (MinHash LSH, SimHash, embedding blocking) emit
*pairs*; deduplication needs *groups* — if A~B and B~C, one canonical
doc must represent {A, B, C} even though A and C never paired. That
closure is a connected-components problem on the pair graph.

Two execution strategies, picked adaptively by edge count (the same
kind of size-based adaptivity as Spark's broadcast-join threshold):

- **Driver union-find** when the (distinct, deduplicated) edge set is
  below ``driver_max_edges``. After LSH/blocking, the pair graph is a
  tiny fraction of the corpus — collecting a bounded edge list and
  solving exactly with path-compressed union-find costs one collect
  instead of one full join+shuffle round *per graph-diameter step*.
  The corpus itself never moves: only pairs do, and the result ships
  back as a (vertex, component) frame that joins distributedly.
- **Iterative min-label propagation with pointer jumping** above the
  threshold. Every vertex starts labeled with its own id; each round a
  vertex adopts the minimum label among itself and its neighbors (one
  equi-join edges x labels + one groupBy(min) — both shuffle on vertex
  id with map-side partial aggregation), then *jumps* through the
  previous round's labels (component <- label(component)), halving
  label-tree depth per round the way parallel pointer-jumping does.
  Plain propagation needs rounds ~ graph diameter; with the jump the
  worst case drops to O(log diameter), so ``max_iters=25`` covers any
  graph a real corpus can produce (2^25 diameter). Lineage is cut per
  round with ``localCheckpoint`` and the loop exits early on a
  zero-moves round.

The alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) achieves the
same O(log^2 n) bound with a similar per-round join shape; min-label +
jumping is preferred here because dedup graphs are unions of small
dense clusters where 2 rounds settle everything and the simpler round
is cheaper.

The driver-side loop control (not the data) is the only non-declarative
part — the same structure Spark's own GraphFrames/Pregel uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Edge-count cutoff for the exact driver-side union-find. 2M edges
# collect in ~100 MB and solve in ~2s of driver CPU — far below one
# distributed propagation round; beyond that, iterate distributedly.
DRIVER_MAX_EDGES = 2_000_000


def _driver_union_find(pair_rows, all_ids) -> dict:
    """Exact min-label components via union-by-min + path compression.

    ``pair_rows``: iterable of (u, v) edges; ``all_ids``: every vertex
    that needs a label. Roots are always the minimum id of their set
    (unions attach the larger root under the smaller), so the returned
    mapping is id -> min reachable id, identical to the distributed
    fixpoint.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in pair_rows:
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rv < ru:
            ru, rv = rv, ru
        parent[rv] = ru
    return {x: find(x) for x in all_ids}


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iters: int = 25,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id
    reachable through the undirected edge set.

    ``vertices`` (optional) adds isolated vertices — docs with no
    near-dup pair become singleton components of themselves. They are
    attached by ONE left join after convergence, not dragged through
    the iterations: only edge-endpoint vertices (a small fraction of a
    deduplicated corpus) ever enter the closure, so its cost scales
    with the pair graph, not the corpus.

    ``driver_max_edges`` gates the exact union-find fast path (0
    disables it and always iterates distributedly).
    """
    spark = edges.sparkSession
    half = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    n_edges = half.count()

    if n_edges <= driver_max_edges:
        # small-graph fast path: exact, single collect, zero rounds
        rows = [(r[0], r[1]) for r in half.collect()]
        id_type = half.schema["u"].dataType
        half.unpersist()
        comp = _driver_union_find(rows, {x for uv in rows for x in uv})
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("id", id_type, False),
                StructField("component", id_type, False),
            ]
        )
        labels = spark.createDataFrame(
            list(comp.items()) or [], schema=schema
        )
    else:
        labels = _propagate_labels(half, max_iters)
        half.unpersist()

    if vertices is not None:
        labels = (
            vertices.select(F.col(id_col).alias("id"))
            .distinct()
            .join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    return labels


def _propagate_labels(half: DataFrame, max_iters: int) -> DataFrame:
    """Distributed min-label propagation + pointer jumping over a
    deduplicated (u < v) edge frame (must be cached by the caller)."""
    sym = half.union(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
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
        cand = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("component").alias("old"),
            F.least(F.col("component"), F.coalesce("nbr_min", "component")).alias(
                "cand"
            ),
        )
        # pointer jump: shortcut through the previous round's labels
        # (component <- label(component)). Labels only decrease and a
        # label is always a vertex id, so label(cand) is a valid —
        # strictly better or equal — label; the jump halves label-tree
        # depth per round, turning O(diameter) convergence into
        # O(log diameter) on chain-shaped graphs.
        # carry the moved flag inside the checkpointed frame: the eager
        # localCheckpoint materializes it anyway, so the convergence
        # check below is a limit(1) over checkpointed blocks instead of
        # a second join+count job per round
        new_labels = (
            cand.join(
                labels.select(
                    F.col("id").alias("cand"), F.col("component").alias("cc")
                ),
                "cand",
                "left",
            )
            .select(
                "id",
                F.least(F.col("cand"), F.coalesce("cc", "cand")).alias(
                    "component"
                ),
                (
                    F.least(F.col("cand"), F.coalesce("cc", "cand"))
                    < F.col("old")
                ).alias("__moved"),
            )
            .localCheckpoint()
        )
        converged = not new_labels.filter("__moved").limit(1).count()
        labels = new_labels.drop("__moved")
        if converged:
            break
    if not converged:
        # a silent exit here would return split/non-minimal components
        # (label-tree depth > 2^max_iters is unreachable in practice,
        # but dedup_groups must never pick wrong canonical survivors
        # without a signal)
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iters} "
            "iterations; labels may be split — raise max_iters",
            RuntimeWarning,
            stacklevel=2,
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

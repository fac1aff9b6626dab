"""scale_profile (round 16): the composition layer over the measured
per-operator scale knobs. Pins

1. the sf0.1 IDENTITY POINTS — at the sf0.1 corpus statistics the
   profile returns exactly the operators' pinned/historical configs
   (n_planes=4, n_centroids=44, block_width=32), so every oracle-gated
   query's output is unchanged by construction (same kwargs -> same
   call), and
2. the 10x-probe CONFIGURATIONS — at the /tmp/scale10x statistics the
   profile reproduces exactly the knob values whose ratios rounds
   14-15 measured (n_planes=8 + n_tables=7, n_centroids=141,
   block_width=3; PERF.md), so the measured ratios ARE the profile's
   ratios (re-confirmed end-to-end by `scale_probe.py run q172f
   q129f ...` — PERF.md round-16 section records the runs).

Statistics come from duckdb over the real parquet (cheap; no Spark
needed for the identity pins) plus a tiny Spark frame for the
`scale_profile_for` derivation test.
"""

from __future__ import annotations

import inspect

import duckdb

from e_commerce_data_pipeline_spark.operators.util import (
    ScaleProfile,
    scale_profile,
    scale_profile_for,
)

SF01 = "/root/testdata/sf0.1"


def _corpus_stats(sf_dir):
    con = duckdb.connect()
    n_docs, span, groups = con.execute(
        f"SELECT COUNT(*), MAX(n_chars) - MIN(n_chars), "
        f"COUNT(DISTINCT lang) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    n_vecs = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    con.close()
    return int(n_docs), int(span), int(groups), int(n_vecs)


def test_sf01_identity_points():
    """At the sf0.1 corpus the profile must return the pinned
    configs — the guarantee that profiles are a no-op where the
    oracle-gated queries already fit the data."""
    n_docs, span, groups, n_vecs = _corpus_stats(SF01)
    prof = scale_profile(
        n_docs=n_docs, n_vecs=n_vecs, doc_span=span, doc_groups=groups
    )
    assert prof.n_planes == 4  # q59's pinned plane count
    assert prof.n_centroids == 44  # ivf.auto_nlist's sf0.1 value
    assert prof.block_width == 32  # q161/q172's pinned width
    # n_tables is RECALL-governed (3 at p=4 for 90% recall of 0.9-sim
    # pairs), deliberately not q59's pinned 2: more tables only add
    # candidates and the operator verifies with exact cosine, so the
    # profile's third table can only RECOVER true pairs, never
    # change/drop an emitted one.
    assert prof.n_tables == 3


def test_sf01_width_matches_query_signature_default():
    """The ER identity point equals the literal default baked into
    the q161/q172 registry functions — same kwargs, same call, same
    output, no run needed."""
    from e_commerce_data_pipeline_spark.plans.queries import QUERIES

    n_docs, span, groups, _ = _corpus_stats(SF01)
    prof = scale_profile(n_docs=n_docs, doc_span=span, doc_groups=groups)
    for qname in (
        "q161_fellegi_sunter_linkage",
        "q172_entity_resolution_pipeline",
    ):
        default = inspect.signature(QUERIES[qname].fn).parameters[
            "block_width"
        ].default
        assert prof.er_kwargs() == {"block_width": default} == {
            "block_width": 32
        }


def test_10x_probe_configurations():
    """At the 10x probe corpus statistics the profile must reproduce
    exactly the measured knob settings of rounds 14-15 (PERF.md:
    planes 8/tables 7 — the recall-table config; nlist 141 — the
    2.46x SemDeDup config; width 3 — the 3.95x/7.55x ER config)."""
    n_docs, span, groups, n_vecs = _corpus_stats(SF01)
    prof = scale_profile(
        n_docs=10 * n_docs,
        n_vecs=10 * n_vecs,
        doc_span=span,  # rotation/roll synthesis preserves spans
        doc_groups=groups,
    )
    assert prof.n_planes == 8
    assert prof.n_tables == 7
    assert prof.n_centroids == 141
    assert prof.block_width == 3


def test_tfidf_regimes():
    """Default = the exact All-Pairs prefix path; an explicit
    absolute stop-token cap switches to the measured capped-brute
    regime (cap WITHOUT prefix — the 1.15x configuration)."""
    exact = scale_profile(n_docs=1000)
    assert exact.tfidf_kwargs() == {"prefix": True}
    capped = scale_profile(n_docs=1000, stop_token_df=3923)
    assert capped.tfidf_kwargs() == {
        "max_token_df": 3923,
        "prefix": False,
    }


def test_er_min_gap_contract():
    """er_min_gap floors the width at 2*gap and switches the offset
    pass on; without it the er_kwargs stay width-only (the pinned
    shape) and sf0.1 identity holds."""
    n_docs, span, groups, _ = _corpus_stats(SF01)
    plain = scale_profile(n_docs=n_docs, doc_span=span, doc_groups=groups)
    assert plain.er_kwargs() == {"block_width": 32}
    gapped = scale_profile(
        n_docs=10 * n_docs,
        doc_span=span,
        doc_groups=groups,
        er_min_gap=8,
    )
    assert gapped.er_kwargs() == {"block_width": 16, "offset_pass": True}
    # occupancy already wider than 2*gap -> width unchanged, offset
    # pass still on (boundary coverage is the point of the contract)
    wide = scale_profile(
        n_docs=n_docs, doc_span=span, doc_groups=groups, er_min_gap=4
    )
    assert wide.er_kwargs() == {"block_width": 32, "offset_pass": True}


def test_partial_profiles_empty_kwargs():
    """Families without statistics stay out of the kwargs — a
    docs-only profile must not emit LSH/IVF knobs and vice versa."""
    docs_only = scale_profile(n_docs=5000, doc_span=500, doc_groups=5)
    assert docs_only.lsh_kwargs() == {} and docs_only.ivf_kwargs() == {}
    assert docs_only.block_width is not None
    vecs_only = scale_profile(n_vecs=2000)
    assert vecs_only.er_kwargs() == {}
    assert vecs_only.n_planes is not None
    none = ScaleProfile()
    assert (
        none.lsh_kwargs()
        == none.ivf_kwargs()
        == none.er_kwargs()
        == {}
    )


def test_scale_profile_for_derives_same_stats(spark):
    """The DataFrame-deriving wrapper must agree with the manual
    call on a corpus whose statistics are known by construction."""
    rows = [
        (i, 100 + (i * 97) % 400, ["en", "fr", "de"][i % 3])
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, n_chars int, lang string")
    emb = spark.createDataFrame(
        [(i,) for i in range(500)], "vec_id int"
    )
    via_frames = scale_profile_for(docs=docs, emb=emb)
    spans = [r[1] for r in rows]
    manual = scale_profile(
        n_docs=300,
        n_vecs=500,
        doc_span=max(spans) - min(spans),
        doc_groups=3,
    )
    assert via_frames == manual


def test_auto_dispatcher_routes(spark):
    """tfidf_cosine_pairs_auto(**prof.tfidf_kwargs()) must hit the
    prefix path by default and the capped-brute path under a cap —
    and both must agree with the directly-called operator on a tiny
    corpus."""
    from e_commerce_data_pipeline_spark.operators.similarity import (
        tfidf_cosine_pairs,
        tfidf_cosine_pairs_auto,
        tfidf_cosine_pairs_prefix,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota"),
            (4, "zeta eta theta iota kappa"),
        ],
        "doc_id int, text string",
    )
    exact = scale_profile(n_docs=4)
    got = sorted(
        tfidf_cosine_pairs_auto(
            docs, threshold=0.5, **exact.tfidf_kwargs()
        ).collect()
    )
    want = sorted(
        tfidf_cosine_pairs_prefix(docs, threshold=0.5).collect()
    )
    assert got == want and len(got) >= 2
    capped = scale_profile(n_docs=4, stop_token_df=100)
    got_c = sorted(
        tfidf_cosine_pairs_auto(
            docs, threshold=0.5, **capped.tfidf_kwargs()
        ).collect()
    )
    want_c = sorted(
        tfidf_cosine_pairs(docs, threshold=0.5, max_token_df=100).collect()
    )
    assert got_c == want_c

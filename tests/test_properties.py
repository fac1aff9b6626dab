"""Property-based tests (hypothesis): algebraic invariants that must
hold for ANY input, not just the fixtures — fixed-point exactness,
sessionization gap laws, quality-score bounds, Jaccard symmetry."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

money = st.decimals(
    min_value="0.01", max_value="99999.99", places=2
).map(float)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _spark_round(x: float, scale: int = 0) -> float:
    """Mirror Spark's F.round on DOUBLE exactly: BigDecimal.valueOf
    (shortest-decimal rendering, i.e. Python repr) then HALF_UP at the
    target scale. Python round() is banker's (half-to-even) and the
    floor(x+0.5) trick misrounds when x+0.5 itself rounds in binary
    (e.g. 0.49999999999999994) — this is the only edge-safe mirror.
    Round-13 verdict: pair (268, 396) slope exactly -87132812.5 →
    Spark/DuckDB -87132813, Python round() -87132812."""
    q = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    )
    return float(q)


@settings(**_SETTINGS)
@given(st.lists(money, min_size=1, max_size=50))
def test_fixed_point_sum_is_exact(spark, values):
    """sum via round(x*100) int arithmetic == decimal sum, always."""
    from decimal import Decimal

    from e_commerce_data_pipeline_spark.functions import fixed_sum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(fixed_sum("v", 100, "s")).collect()[0]["s"]
    want = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),  # event offsets, seconds
        min_size=1,
        max_size=30,
    )
)
def test_sessionization_respects_gap_law(spark, offsets):
    """Consecutive events <=600s apart share a session; >600s split."""
    from e_commerce_data_pipeline_spark.operators.sessionize import assign_sessions

    offsets = sorted(set(offsets))
    rows = [
        ("u", f"2024-01-01 00:00:00", i, off)
        for i, off in enumerate(offsets)
    ]
    df = (
        spark.createDataFrame(rows, "user_id string, base string, event_id int, off int")
        .withColumn("ts", F.col("base").cast("timestamp") + F.make_dt_interval(secs=F.col("off")))
        .drop("base", "off")
    )
    got = {
        r["event_id"]: r["session_no"]
        for r in assign_sessions(df).collect()
    }
    # reference implementation in plain python
    want, sess = {}, 1
    for i, off in enumerate(offsets):
        if i > 0 and off - offsets[i - 1] > 600:
            sess += 1
        want[i] = sess
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=1,
        max_size=20,
    )
)
def test_quality_score_bounds_and_monotonicity(spark, flags):
    """Score is always in [0,1], exactly 1 iff no violations, and each
    violation costs exactly 0.25 until the clamp."""
    from e_commerce_data_pipeline_spark.operators.validation import event_quality_checks

    rows = [
        (
            i,
            None if missing_user else i,
            "bad" if bad_type else "click",
            -1.0 if bad_value else 1.0,
            "2024-01-29 12:00:00",
        )
        for i, (missing_user, bad_type, bad_value) in enumerate(flags)
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double, ts_s string"
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    out = {r["event_id"]: r for r in event_quality_checks(df, now="2024-01-30 00:00:00").collect()}
    for i, (missing_user, bad_type, bad_value) in enumerate(flags):
        n = sum([missing_user, bad_type, bad_value])
        r = out[i]
        assert r["n_violations"] == n
        assert r["quality_score"] == max(0.0, 1.0 - 0.25 * n)
        assert 0.0 <= r["quality_score"] <= 1.0


@settings(**_SETTINGS)
@given(st.data())
def test_jaccard_pairs_symmetric_and_bounded(spark, data):
    """Jaccard results don't depend on doc id order and stay in (0,1]."""
    from e_commerce_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = data.draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=3, max_size=10).map(" ".join),
            min_size=2,
            max_size=6,
        )
    )
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    pairs = ngram_jaccard_pairs(df, threshold=0.01).collect()
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_inter"] <= min(r["n_a"], r["n_b"])
    # reversing ids yields the same pair set
    df2 = spark.createDataFrame(
        [(len(docs) - 1 - i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    pairs2 = ngram_jaccard_pairs(df2, threshold=0.01).collect()
    remap = {
        tuple(sorted((len(docs) - 1 - r["a_id"], len(docs) - 1 - r["b_id"])))
        for r in pairs2
    }
    assert {(r["a_id"], r["b_id"]) for r in pairs} == remap


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_span_dup_stats_matches_bruteforce(spark, docs):
    """span_dup_stats == a python brute-force over distinct spans."""
    from e_commerce_data_pipeline_spark.operators.dedup import span_dup_stats

    n = 3
    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in span_dup_stats(df, span_n=n).collect()}

    spans = {
        i: {
            " ".join(toks[j : j + n])
            for j in range(len(toks) - n + 1)
        }
        for i, toks in enumerate(docs)
    }
    for i, ss in spans.items():
        shared = {
            s for s in ss if any(s in so for j, so in spans.items() if j != i)
        }
        assert got[i]["n_spans"] == len(ss)
        assert got[i]["n_shared_spans"] == len(shared)
        want_frac = (1_000_000 * len(shared)) // max(len(ss), 1)
        assert got[i]["dup_frac_micro"] == want_frac


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(
            [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "entirely different words in this sentence here",
                "pack my box with five dozen liquor jugs now",
            ]
        ),
        min_size=2,
        max_size=8,
    )
)
def test_incremental_dedup_equals_filtered_all_pairs(spark, texts):
    """incremental(new=evens, corpus=odds) == near_dup_pairs filtered
    to cross-side pairs (modulo orientation)."""
    from e_commerce_data_pipeline_spark.operators.dedup import (
        incremental_near_dups,
        near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    batch = df.filter(F.col("doc_id") % 2 == 0)
    corpus = df.filter(F.col("doc_id") % 2 == 1)
    inc = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_near_dups(
            corpus, batch, threshold=0.2, use_portable_hash=True
        ).collect()
    }
    allp = {}
    for r in near_dup_pairs(df, threshold=0.2, use_portable_hash=True).collect():
        a, b = r["a_id"], r["b_id"]
        if a % 2 == 0 and b % 2 == 1:
            allp[(a, b)] = r["jaccard"]
        elif b % 2 == 0 and a % 2 == 1:
            allp[(b, a)] = r["jaccard"]
    assert inc == allp


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60),
    st.sampled_from([1 << 10, 1 << 13]),
    st.integers(min_value=1, max_value=5),
)
def test_bloom_never_false_negative(spark, keys, m_bits, k):
    """A Bloom filter may admit strangers but must NEVER reject a
    member — for any key set, m, and k."""
    from e_commerce_data_pipeline_spark.operators.bloom import (
        build_bloom,
        might_contain,
    )

    df = spark.createDataFrame([(v,) for v in keys], "k long")
    bf = build_bloom(df, "k", m_bits=m_bits, k=k)
    kept = {
        r["k"]
        for r in df.filter(might_contain(bf, F.col("k"))).collect()
    }
    assert kept == set(keys)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(st.integers(min_value=0, max_value=4), min_size=24, max_size=24),
)
def test_png_roundtrip_any_pixels_any_filters(w, h, seed, filters):
    """decode(encode(px, any per-row filter choice)) == px for ANY
    uint8 image — every unfilter branch must invert its filter
    exactly, including at row/column boundaries (h=1, w=1)."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px, filters=filters[:h])) == px).all()


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=8, max_value=2000),
    st.integers(min_value=0, max_value=255),
)
def test_png_single_byte_damage_never_crashes(seed, pos_scale, xor):
    """Flipping any byte of a valid PNG must yield either a clean
    decode (only if the flip is a no-op) or (None, None) from
    _decode_any — never an uncaught exception (a corrupt file must
    not kill a 100 TB scan)."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        _decode_any,
        encode_png,
        make_test_pixels,
    )

    good = encode_png(make_test_pixels(12, 9, seed=seed % 100))
    pos = pos_scale % len(good)
    dmg = bytearray(good)
    dmg[pos] ^= xor
    px, fmt = _decode_any(bytes(dmg))
    if xor == 0:
        assert fmt == "png" and px is not None
    else:
        assert (px is None and fmt is None) or fmt == "png"


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=50, max_value=95),
)
def test_jpeg_progressive_equals_baseline_any_image(w, h, seed, quality):
    """Progressive (SOF2) is a lossless re-coding of the baseline
    quantized coefficients: for ANY image and quality, decoding
    either stream yields identical pixels — pins the whole scan
    machinery (DC/AC successive approximation, spectral bands, EOBn
    runs, optimal tables) against the baseline path."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    db = decode_jpeg(encode_jpeg(px, quality=quality))
    dp = decode_jpeg(encode_jpeg_progressive(px, quality=quality))
    assert np.array_equal(db, dp)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ima_multichannel_equals_per_channel_mono(ch, groups, seed):
    """N-channel IMA ADPCM decode == N independent mono decodes of
    the per-channel streams, for ANY nibble content and channel
    count — the interleaving layer must never leak state across
    channels."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_multi,
        ima_adpcm_decode,
    )

    rng = np.random.default_rng(seed)
    n = groups * 8
    streams = [
        rng.integers(0, 16, size=n, dtype=np.uint8) for _ in range(ch)
    ]
    inits = [
        (int(rng.integers(-32768, 32768)), int(rng.integers(0, 89)))
        for _ in range(ch)
    ]
    dec, _rate = decode_wav(encode_wav_ima_multi(streams, inits))
    assert dec.shape == (n + 1, ch)
    for c in range(ch):
        assert dec[:, c].tolist() == ima_adpcm_decode(
            streams[c], inits[c][0], inits[c][1]
        )


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_gif_partial_frame_any_placement(w, h, dx, dy, seed, interlace):
    """ANY in-bounds frame placement composites exactly: frame pixels
    at the offset, background color everywhere else."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    # <= 256 distinct colors guaranteed: low-entropy palette
    px = (rng.integers(0, 6, size=(h, w, 3)) * 40).astype(np.uint8)
    sw, sh = w + dx, h + dy
    ox = int(rng.integers(0, dx + 1))
    oy = int(rng.integers(0, dy + 1))
    bg = tuple(int(v) for v in rng.integers(0, 256, size=3))
    out = decode_gif(
        encode_gif(
            px, interlace=interlace, screen=(sw, sh), offset=(ox, oy),
            background=bg,
        )
    )
    exp = np.empty((sh, sw, 3), np.uint8)
    exp[:, :] = bg
    exp[oy : oy + h, ox : ox + w] = px
    assert np.array_equal(out, exp)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=14),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=13),
            st.integers(min_value=0, max_value=13),
        ),
        min_size=0,
        max_size=20,
    ),
)
def test_component_split_never_leaks(spark, n, edges):
    """For ANY duplicate graph, splitting by connected component
    means NO edge crosses splits — the q190 leakage-safe-split
    invariant. Also: every edge's endpoints must share a component."""
    from pyspark.sql import functions as F

    from e_commerce_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from e_commerce_data_pipeline_spark.operators.sampling import (
        hash_uniform,
    )

    edges = [(a % n, b % n) for a, b in edges if a % n != b % n]
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "a_id long, b_id long"
    )
    if not edges:
        pairs = pairs.filter(F.lit(False))
    comp = connected_components(
        pairs, "a_id", "b_id", vertices=verts, id_col="id"
    )
    cmap = {r["id"]: r["component"] for r in comp.collect()}
    assert set(cmap) == set(range(n))
    for a, b in edges:
        assert cmap[a] == cmap[b], (a, b)
    u = hash_uniform(F.col("component"), salt="dsplit")
    split = comp.select(
        "id",
        F.when(u < 0.5, "train").otherwise("test").alias("split"),
    )
    smap = {r["id"]: r["split"] for r in split.collect()}
    for a, b in edges:
        assert smap[a] == smap[b], (a, b)  # same component -> same split


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_hard_negatives_match_bruteforce(spark, seed):
    """For ANY embeddings/labels, hard_negative_mining's picks equal
    the numpy brute force under the same (rounded sim DESC, id ASC)
    rule, and margin = pos_sim - neg_sim."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.similarity import (
        hard_negative_mining,
    )

    rng = np.random.default_rng(seed)
    n, d = 12, 5
    vecs = rng.standard_normal((n, d))
    labels = rng.integers(0, 3, size=n)
    rows = [
        (i, int(labels[i]), [float(x) for x in vecs[i]])
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    qdf = emb.filter("vec_id < 4")
    got = {
        r["query_id"]: r
        for r in hard_negative_mining(emb, qdf).collect()
    }
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # mirror the operator's F.round(sim, 6) (HALF_UP on shortest
    # decimal), not np.round (half-to-even) — same divergence class
    # as the r13 Theil-Sen falsifier.
    sims = np.vectorize(lambda x: _spark_round(x, 6))(unit @ unit.T)
    for qi in range(4):
        pos = [
            (-sims[qi, j], j)
            for j in range(n)
            if j != qi and labels[j] == labels[qi]
        ]
        neg = [
            (-sims[qi, j], j)
            for j in range(n)
            if j != qi and labels[j] != labels[qi]
        ]
        if not pos or not neg:
            assert qi not in got
            continue
        bp, bn = min(pos), min(neg)
        r = got[qi]
        assert (r["pos_id"], r["neg_id"]) == (bp[1], bn[1]), qi
        assert abs(r["margin"] - (-bp[0] - -bn[0])) < 1e-9


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=1, max_value=100_000),
        min_size=0,
        max_size=200,
    )
)
def test_jpg_optimal_table_valid_for_any_frequencies(freqs):
    """For ANY symbol frequency map, the K.2 optimal-table builder
    must yield a decodable canonical table: every requested symbol
    coded, all lengths <= 16, prefix-free by construction, and no
    code equal to all-ones at its length (the JPEG reserved
    pattern); encode->decode of every symbol round-trips."""
    from e_commerce_data_pipeline_spark.operators.multimodal import (
        _jpg_canonical_codes,
        _jpg_decode_table,
        _jpg_optimal_table,
    )

    bits, vals = _jpg_optimal_table(freqs)
    assert len(vals) == sum(bits) and len(bits) == 16
    if freqs:
        assert set(vals) == set(freqs)
    enc = _jpg_canonical_codes(bits, vals)
    dec = _jpg_decode_table(bits, vals)
    for sym, (code, ln) in enc.items():
        assert 1 <= ln <= 16
        assert code != (1 << ln) - 1, (sym, ln)  # reserved all-ones
        assert dec[(ln, code)] == sym


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=255),
)
def test_jpeg_progressive_single_byte_damage_never_crashes(
    seed, pos_scale, xor
):
    """Flipping any byte of a valid progressive JPEG must yield a
    clean decode or (None, None) from _decode_any — never an
    uncaught exception (a corrupt file must not kill a 100 TB
    scan)."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        _decode_any,
        encode_jpeg_progressive,
        make_test_pixels,
    )

    good = encode_jpeg_progressive(
        make_test_pixels(16, 12, seed=seed % 100), quality=85
    )
    pos = pos_scale % len(good)
    dmg = bytearray(good)
    dmg[pos] ^= xor
    try:
        px, fmt = _decode_any(bytes(dmg))
    except NotImplementedError:
        # a flip can forge a marker/precision byte into an honestly
        # gated variant (e.g. 12-bit) — the loud gate is the
        # documented outcome for valid-looking unsupported files
        assert xor != 0
        return
    if xor == 0:
        assert fmt == "jpeg" and px is not None
    else:
        assert (px is None and fmt is None) or fmt == "jpeg"


@settings(**_SETTINGS)
@given(
    st.sampled_from(
        ["bmp", "ppm", "png", "jpeg", "jpeg_prog", "gif", "wav", "g711",
         "ima"]
    ),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=8, max_value=4000),
    st.integers(min_value=1, max_value=255),
)
def test_any_codec_single_byte_damage_raises_documented_types(
    fmt, seed, pos_scale, xor
):
    """Generalizes the exhaustive fixed-stream bit-flip sweeps
    (tests/test_multimodal.py) across stream CONTENTS: for a random
    valid stream of any supported format, XOR-ing any single byte
    either still decodes or raises ValueError — or NotImplementedError
    when the damage lands in a real variant-selector field and hits
    the honest require_codec gate. Any other exception type is the
    round-7 crash class (stall, overflow, task-killing error)."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed % 10_000)
    if fmt == "bmp":
        b, dec = mm.encode_bmp(
            rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
        ), mm.decode_bmp
    elif fmt == "ppm":
        b, dec = mm.encode_ppm(
            rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
        ), mm.decode_ppm
    elif fmt == "png":
        b, dec = mm.encode_png(
            rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
        ), mm.decode_png
    elif fmt == "jpeg":
        b, dec = mm.encode_jpeg(
            rng.randint(0, 256, (8, 8)).astype(np.uint8), quality=50
        ), mm.decode_jpeg
    elif fmt == "jpeg_prog":
        b, dec = mm.encode_jpeg_progressive(
            rng.randint(0, 256, (8, 8)).astype(np.uint8), quality=50
        ), mm.decode_jpeg
    elif fmt == "gif":
        b, dec = mm.encode_gif(
            rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
        ), mm.decode_gif
    elif fmt == "wav":
        b, dec = mm.encode_wav(
            rng.randint(-3000, 3000, 64).astype(np.int16)
        ), mm.decode_wav
    elif fmt == "g711":
        b, dec = mm.encode_wav_g711(
            rng.randint(0, 256, 64).astype(np.uint8)
        ), mm.decode_wav
    else:
        b, dec = mm.encode_wav_ima(
            rng.randint(0, 16, 64).astype(np.uint8), 0, 0
        ), mm.decode_wav
    dmg = bytearray(b)
    dmg[pos_scale % len(b)] ^= xor
    try:
        dec(bytes(dmg))
    except (ValueError, NotImplementedError):
        pass
    # any other exception type propagates -> test fails


# ---------------------------------------------------------------------------
# Round-10 boundary-domain properties for the integer-recurrence
# operators (VERDICT r9 task 10): the exact_quantiles int64 overflow
# was found by hypothesis at ±2^62 — the same budget now covers the
# EWMA fold (q174), the isotonic minimax fit (q187), and the
# Theil-Sen slope-median composition (q162; exact_quantiles' own
# ±2^62 property lives in tests/test_quantiles.py).
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    st.dictionaries(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_integer_ewma_boundary_domains(by_di, shift):
    """The q174 fold at domain extremes (±2^62 inputs, single-row,
    sparse gap-filled calendars, any dyadic alpha): (a) it equals an
    independent exact-rational reference with truncation toward
    zero, (b) each state is a contraction — s_t lies in the closed
    interval between s_{t-1} and x_t, so the whole series stays
    inside the running input envelope and can never overflow int64
    when the inputs fit, (c) a constant series is a fixed point."""
    import math
    from fractions import Fraction

    from e_commerce_data_pipeline_spark.operators.regression import (
        integer_ewma,
    )

    # keep the gap-filled range bounded so the fold stays fast
    keys = sorted(by_di)
    base = keys[0]
    pairs = [(base + min(k - base, 5000), v) for k, v in by_di.items()]
    pairs = list(dict(pairs).items())
    out = integer_ewma(pairs, shift=shift)
    ref_by_di = dict(pairs)
    d0, d1 = min(ref_by_di), max(ref_by_di)
    assert [t[0] for t in out] == list(range(d0, d1 + 1))
    s_ref = None
    prev = None
    for di, x, s in out:
        x_want = ref_by_di.get(di, 0)
        assert x == x_want
        if s_ref is None:
            s_ref = x_want
        else:
            # independent truncation: math.trunc on the exact rational
            s_ref = s_ref + math.trunc(
                Fraction(x_want - s_ref, 1 << shift)
            )
        assert s == s_ref, (di, shift)
        if prev is not None:
            lo, hi = min(prev, x), max(prev, x)
            assert lo <= s <= hi, "EWMA state escaped the step envelope"
        prev = s
    # fixed point: constant inputs with no gaps
    const = integer_ewma([(0, 37), (1, 37), (2, 37)], shift=shift)
    assert [s for _, _, s in const] == [37, 37, 37]


def _pava_reference(bands):
    """Classic pool-adjacent-violators on (x, hits, n) bands with
    exact rational pooling; returns x -> fitted rate as the ONE
    double division of the pooled integer sums (the fixed_avg
    discipline the minimax form promises to match)."""
    from fractions import Fraction

    blocks = []  # [sum_hits, sum_n, [xs]]
    for x, hits, n in sorted(bands):
        blocks.append([hits, n, [x]])
        while len(blocks) >= 2 and Fraction(
            blocks[-2][0], blocks[-2][1]
        ) >= Fraction(blocks[-1][0], blocks[-1][1]):
            h2, n2, xs2 = blocks.pop()
            blocks[-1][0] += h2
            blocks[-1][1] += n2
            blocks[-1][2].extend(xs2)
    out = {}
    for h, n, xs in blocks:
        for x in xs:
            out[x] = h / n  # double division of exact integer sums
    return out


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31),
            st.integers(min_value=1, max_value=2**25),
            st.integers(min_value=0, max_value=2**25),
        ),
        min_size=1,
        max_size=18,
        unique_by=lambda t: t[0],
    )
)
def test_isotonic_fit_matches_pava_any_bands(spark, raw):
    """The q187 minimax closed form equals classic PAVA for ANY band
    table — single band, zero-hit bands, saturated bands (hits = n),
    2^25-scale counts (where double division ordering still matches
    exact rational ordering), negative and extreme x keys — and the
    fitted curve is non-decreasing and inside [0, 1]."""
    from e_commerce_data_pipeline_spark.operators.regression import (
        isotonic_fit,
    )

    bands = [(x, min(h, n), n) for x, n, h in raw]
    df = spark.createDataFrame(bands, "x long, hits long, n long")
    got = {
        r["x"]: r["fitted_rate"]
        for r in isotonic_fit(df).collect()
    }
    want = _pava_reference(bands)
    assert set(got) == set(want)
    prev = None
    for x in sorted(got):
        assert got[x] == want[x], (x, bands)
        assert 0.0 <= got[x] <= 1.0
        if prev is not None:
            assert got[x] >= prev, "fitted curve not monotone"
        prev = got[x]


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=-(2**30), max_value=2**30),
        min_size=2,
        max_size=16,
    )
)
# r13-verdict regression: the single pair (268, 396) has slope exactly
# 1e6 * -11153 / 128 = -87132812.5 — Spark/DuckDB HALF_UP → -87132813,
# Python banker's round() → -87132812.
@example(by_di={268: 0, 396: -11153})
def test_theil_sen_slope_median_matches_bruteforce(spark, by_di):
    """The q162 composition — micro-quantized pair slopes through
    exact_quantiles median narrowing — equals the brute-force median
    of all pair slopes for ANY daily series: ties everywhere (flat
    series → zero-width slope domain), two-point series (single
    pair), adversarial day gaps, ±2^30 values (the operator's
    documented kilodollar input scale with micro-quantization
    headroom)."""
    from e_commerce_data_pipeline_spark.operators.quantiles import (
        exact_quantiles,
    )

    days = sorted(by_di)
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            da, db = days[i], days[j]
            # mirror q162's expression: F.round (HALF_UP on the
            # shortest-decimal rendering), NOT Python round() —
            # banker's rounding diverges at exact .5 slopes (r13
            # verdict falsifier pinned as @example below).
            s = _spark_round(
                1000000.0 * (by_di[db] - by_di[da]) / (db - da)
            )
            slopes.append(int(s))
    df = spark.createDataFrame(
        [(da, by_di[da]) for da in days], "di long, x long"
    )
    a = df.select(F.col("di").alias("da"), F.col("x").alias("xa"))
    b = df.select(F.col("di").alias("db"), F.col("x").alias("xb"))
    sl = a.join(b, F.col("da") < F.col("db")).select(
        F.round(
            F.lit(1000000.0)
            * (F.col("xb") - F.col("xa"))
            / F.expr("nullif(db - da, 0)")
        )
        .cast("long")
        .alias("s")
    )
    rows = exact_quantiles(sl, "s", [50], buckets=16).collect()
    n = len(slopes)
    k = max(1, -(-50 * n // 100))
    want = sorted(slopes)[k - 1]
    assert [(r.percent, r.n, r.k, r.value) for r in rows] == [
        (50, n, k, want)
    ]


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    p_idx=st.integers(min_value=0, max_value=2),
    pred=st.integers(min_value=1, max_value=7),
    pt=st.integers(min_value=0, max_value=7),
    color=st.booleans(),
    rr=st.integers(min_value=0, max_value=4),
)
def test_jpeg_lossless_point_transform_property(
    seed, p_idx, pred, pt, color, rr
):
    """Round 11 (verdict task): lossless JPEG with a RANDOM point
    transform — decoded samples must be exactly (v >> Pt) << Pt for
    every predictor x precision x Pt in range, gray and color, with
    and without row-aligned restarts. The encoder's re-scaling and
    the decoder's inverse shift have to agree on the predictor
    DOMAIN (prediction runs on the shifted samples, T.81 H.1.2)."""
    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(seed)
    p = (8, 12, 16)[p_idx]
    pt = min(pt, p - 1)
    h, w = rng.randint(1, 14), rng.randint(1, 14)
    shape = (h, w, 3) if color else (h, w)
    dt = np.uint8 if p <= 8 else np.uint16
    a = rng.randint(0, 1 << p, shape).astype(dt)
    b = encode_jpeg_lossless(
        a,
        predictor=pred,
        point_transform=pt,
        precision=p,
        restart_rows=rr if 0 < rr < h else 0,
    )
    raw = decode_jpeg(b)
    assert raw.dtype == dt
    want = (a.reshape(h, w, -1).astype(np.int64) >> pt) << pt
    if not color:
        want = np.repeat(want, 3, axis=2)
    assert np.array_equal(raw.astype(np.int64), want)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    sizes=st.lists(
        st.sampled_from([0, 1, 7, 254, 255, 256, 510, 511, 600]),
        min_size=1,
        max_size=8,
    ),
    max_segs=st.integers(min_value=1, max_value=50),
    own=st.lists(st.booleans(), min_size=8, max_size=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ogg_lacing_random_splits_property(sizes, max_segs, own, seed):
    """Round 11 (verdict task): the Ogg page writer under RANDOM
    packet sizes (empty, exact 255-multiples, spans) and RANDOM page
    budgets must produce pages an independent RFC 3533 re-parser
    reassembles into the ORIGINAL packets — with every page CRC
    valid (forward 0x04C11DB7), BOS on page 0, EOS on the last, the
    continued flag consistent, and 255-terminated packets carrying
    their explicit 0 lacing terminator."""
    import struct

    import numpy as np

    from e_commerce_data_pipeline_spark.operators.multimodal import (
        _ogg_crc,
        _ogg_encapsulate,
    )

    rng = np.random.RandomState(seed)
    packets = [
        (rng.bytes(s), k * 100, bool(own[k % len(own)]))
        for k, s in enumerate(sizes)
    ]
    b = _ogg_encapsulate(packets, max_segs=max_segs)
    # independent re-parse (test-local, NOT the production walker)
    pos, got, cur = 0, [], bytearray()
    first, continued_expected = True, False
    last_page_end = 0
    while pos < len(b):
        assert b[pos : pos + 4] == b"OggS"
        htype = b[pos + 5]
        if first:
            assert htype & 0x02, "BOS missing on first page"
        assert bool(htype & 0x01) == continued_expected
        nsegs = b[pos + 26]
        segs = b[pos + 27 : pos + 27 + nsegs]
        paylen = sum(segs)
        page_end = pos + 27 + nsegs + paylen
        (crc_stored,) = struct.unpack_from("<I", b, pos + 22)
        z = bytearray(b[pos:page_end])
        z[22:26] = b"\x00\x00\x00\x00"
        assert _ogg_crc(bytes(z)) == crc_stored, "page CRC invalid"
        p = pos + 27 + nsegs
        for s in segs:
            cur += b[p : p + s]
            p += s
            if s < 255:
                got.append(bytes(cur))
                cur = bytearray()
        continued_expected = bool(nsegs) and segs[-1] == 255
        last_page_end = page_end
        first = False
        pos = page_end
    assert last_page_end == len(b)
    assert b[_find_last_ogg_page(b) + 5] & 0x04, "EOS missing"
    assert not cur, "dangling continued packet"
    assert got == [d for d, _, _ in packets]


def _find_last_ogg_page(b: bytes) -> int:
    pos, last = 0, 0
    while pos < len(b):
        last = pos
        nsegs = b[pos + 26]
        pos += 27 + nsegs + sum(b[pos + 27 : pos + 27 + nsegs])
    return last

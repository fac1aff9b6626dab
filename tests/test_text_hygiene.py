"""Round-11 raw-web hygiene operators: HTML->text extraction, URL
canonicalization, Unicode NFC/NFKC + control-char stripping.

Pins the contracts the q65/q194/q25 oracles rely on:
- html_to_text(wrap(x)) recovers x (modulo whitespace collapse) for
  the four q65 shells — the identity that lets the q65 oracle keep
  computing from raw text;
- canonicalize_url is idempotent and matches closed-form expected
  outputs (the q194 arms);
- the q25 NFKC closed-form suffix constants match stdlib unicodedata.
"""

from __future__ import annotations

import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators import text as T


def _one(spark, col, value, typ="string"):
    return (
        spark.createDataFrame([(value,)], f"v {typ}")
        .select(col.alias("out"))
        .collect()[0]["out"]
    )


# ---------------------------------------------------------------- HTML


def test_html_strip_basics(spark):
    cases = {
        "<p>hello</p>": "hello",
        "<P CLASS='x'>hello</P>": "hello",  # case-insensitive tags
        "a < b but &gt; c": "a < b but > c",  # bare '<' is text
        "<div><span>nest</span>ed</div>": "nested",
        "<ul><li>one<li>two</ul>": "onetwo",  # unclosed tags
        "x<br/>y<hr />z": "xyz",  # self-closing
        "<!DOCTYPE html><p>d</p>": "d",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(T.html_to_text("v").alias("out")).collect()
    ]
    assert got == list(cases.values())


def test_html_script_style_comment_blocks(spark):
    cases = {
        # script body legally carries bare < > & and multi-line code
        '<script type="t">\nif(a<b&&c>d){x("&");}\n</script>ok': "ok",
        "<SCRIPT>u()</SCRIPT>ok": "ok",  # case-insensitive
        "<style>p>a{color:#fff}\nq{...}</style>ok": "ok",
        "<!-- c with <tags> & amp -->ok": "ok",
        "<!-- multi\nline -->ok": "ok",
        # comment is stripped BEFORE the tag pass, so an embedded
        # tag never escapes the comment
        "a<!--<p>-->b": "ab",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(T.html_to_text("v").alias("out")).collect()
    ]
    assert got == list(cases.values())


def test_html_cdata_unwraps_payload(spark):
    assert (
        _one(spark, T.html_to_text(F.col("v")), "<![CDATA[a < b & c]]>d")
        == "a < b & c d".replace("c d", "cd")  # collapse joins 'c' 'd'
    )
    # CDATA before tag pass: the marker itself must not half-match
    assert _one(spark, T.html_to_text(F.col("v")), "<![CDATA[]]>x") == "x"


def test_html_entity_decode_order(spark):
    # amp forms decode LAST, in ONE pass: double-encoded entities
    # stay literal in BOTH compositions (round-12 advice fix: the
    # sequential two-pass chain double-decoded '&#38;amp;' to '&')
    cases = {
        "&amp;lt;": "&lt;",
        "&amp;#38;": "&#38;",  # numeric-amp double-encoding too
        "&#38;amp;": "&amp;",  # ...and the reverse composition
        "&#38;lt;": "&lt;",
        "&lt;p&gt;": "<p>",
        "a&nbsp;b": "a b",
        "&quot;q&quot; &#39;s&#39; &apos;t&apos;": "\"q\" 's' 't'",
        "&#34;n&#38;m&#160;": '"n&m',  # numeric core + trailing nbsp trim
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(T.html_to_text("v").alias("out")).collect()
    ]
    assert got == list(cases.values())
    # decoded &lt; must NOT create a new strippable tag
    assert _one(spark, T.html_to_text(F.col("v")), "&lt;p&gt;x&lt;/p&gt;") == "<p>x</p>"


def test_html_quoted_gt_attribute_contract(spark):
    # documented regex-extractor limitation: '>' inside a quoted
    # attribute value ends the tag early (the remainder is text)
    out = _one(spark, T.html_to_text(F.col("v")), '<a title="a>b">x</a>')
    assert out == 'b">x'


def test_html_tag_stats_counts_markup_lt(spark):
    assert _one(spark, T.html_tag_stats(F.col("v")), "<p>a&lt;b</p>") == 2


@settings(deadline=None, max_examples=25, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=120,
    ),
    arm=st.integers(min_value=0, max_value=3),
)
def test_html_wrap_strip_identity_property(spark, text, arm):
    """strip(wrap(x)) == whitespace-collapsed (payload + x) for every
    q65 shell, for ARBITRARY printable-ASCII x (incl. '<', '&',
    quotes) — through the FULL entity decode q65 now runs (arm 1's
    shell carries the entity-rich visible payload)."""
    from e_commerce_data_pipeline_spark.plans.queries import (
        _Q65_ENTITY_DECODED,
        _Q65_HTML_POST,
        _Q65_HTML_PRE,
    )

    enc = (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    html = _Q65_HTML_PRE[arm] + enc + _Q65_HTML_POST[arm]
    got = _one(spark, T.html_to_text(F.col("v"), entities="full"), html)
    expected = (_Q65_ENTITY_DECODED if arm == 1 else "") + text
    assert got == " ".join(expected.split())


def test_q65_entity_payload_decodes_to_pinned_constant():
    """The q65 oracle's closed-form decoded arm-1 prefix is exactly
    stdlib html.unescape over the shell payload."""
    import html as _html

    from e_commerce_data_pipeline_spark.plans.queries import (
        _Q65_ENTITY_DECODED,
        _Q65_ENTITY_PAYLOAD,
    )

    assert _html.unescape(_Q65_ENTITY_PAYLOAD) == _Q65_ENTITY_DECODED


# round-12 full-entity mode: the complete HTML5 table via the Arrow
# html.unescape kernel, diffed against a pure-Python reference strip
# over randomized entity streams (named + decimal + hex + invalid).

_ENTITY_ATOMS = st.sampled_from(
    ["&mdash;", "&eacute;", "&hellip;", "&copy;", "&amp;", "&lt;",
     "&gt;", "&#x2019;", "&#169;", "&#38;", "&#x27;", "&amp;lt;",
     "&#38;amp;", "&bogus;", "&#xZZ;", "&", "plain", " x ", "<p>",
     "</p>", "a<b", "&Auml;", "&#xA9;", "&frac12;"]
)


@settings(deadline=None, max_examples=25, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(atoms=st.lists(_ENTITY_ATOMS, min_size=1, max_size=10))
def test_html_full_entity_stream_matches_unescape(spark, atoms):
    import html as _html
    import re

    raw = "".join(atoms)
    got = _one(
        spark, T.html_to_text(F.col("v"), entities="full"), raw
    )
    # reference: same tag model, then stdlib html.unescape
    ref = re.sub(r"(?i)</?[a-z!][^>]*>", "", raw)
    ref = " ".join(_html.unescape(ref).split())
    assert got == ref


def test_html_full_entities_named_hex_decimal(spark):
    cases = {
        "News &mdash; d&eacute;j&agrave; vu": "News — déjà vu",
        "&#x2019;q&#x2019;&hellip; &#169;2024": "’q’… ©2024",
        # single-pass semantics hold in full mode too
        "&amp;lt;": "&lt;",
        "&#38;amp;": "&amp;",
        # unknown entities stay literal
        "&bogus; &#xZZ;": "&bogus; &#xZZ;",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(
            T.html_to_text("v", entities="full").alias("out")
        ).collect()
    ]
    assert got == list(cases.values())


def test_html_to_text_rejects_bad_entities_mode():
    import pytest

    with pytest.raises(ValueError):
        T.html_to_text(F.lit("x"), entities="most")


# ----------------------------------------------------------------- URL


def test_canonicalize_url_closed_forms(spark):
    cases = {
        # q194 arms
        "HTTPS://Shop.Example:443/p/9?utm_source=ad&b=2&a=1#frag":
            "https://shop.example/p/9?a=1&b=2",
        "http://shop.example:80?z=9&gclid=22&q=x":
            "http://shop.example/?q=x&z=9",
        "https://shop.example:8443/p//x?":
            "https://shop.example:8443/p//x",
        # already canonical passes through byte-identical
        "https://shop.example/p/7": "https://shop.example/p/7",
        # non-web / malformed pass through unchanged
        "ftp://files.example/x": "ftp://files.example/x",
        "shop.example/no-scheme": "shop.example/no-scheme",
        "": "",
        # tracking-key filter is exact-key, case-insensitive prefix
        "https://h.example/a?UTM_CAMPAIGN=x&keep=1":
            "https://h.example/a?keep=1",
        # 'ref' is a tracking KEY; 'refresh' is not (no prefix match)
        "https://h.example/a?ref=1&refresh=2":
            "https://h.example/a?refresh=2",
        # userinfo URLs pass through unchanged (self-review fix: the
        # naive host split would otherwise mangle them)
        "https://User:Pw@Shop.Example:443/p#f":
            "https://User:Pw@Shop.Example:443/p#f",
        # round-12: bracketed IPv6 authorities pass through too
        "http://[::1]:8080/x": "http://[::1]:8080/x",
        # round-12 advice fix: '?' inside the FRAGMENT is never
        # promoted into the query
        "http://h.example/p#x?y": "http://h.example/p",
        # round-12 percent-encoding normalization (the q194 arms):
        # unreserved escapes decode, remaining hex uppercases,
        # invalid '%' spans stay byte-identical
        "https://shop.example/p%61th%2F/%7e9?x=%2fv&utm_id=3#f?g":
            "https://shop.example/path%2F/~9?x=%2Fv",
        "HTTP://Shop.Example/a%2fb%4Ac%zz?":
            "http://shop.example/a%2FbJc%zz",
        "https://h.example/%": "https://h.example/%",
        "https://h.example/%%41": "https://h.example/%A",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(T.canonicalize_url("v").alias("out")).collect()
    ]
    assert got == list(cases.values())


_URL_STRATEGY = st.builds(
    lambda scheme, host, port, path, params, frag: (
        scheme
        + "://"
        + host
        + (f":{port}" if port else "")
        + path
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    host=st.sampled_from(
        ["Shop.Example", "a.b.example", "X.example", "h1.example"]
    ),
    port=st.sampled_from(["", "80", "443", "8080"]),
    path=st.sampled_from(
        ["", "/", "/p", "/p/x", "/p//x", "/p%61th", "/%2fx", "/%zz%4A"]
    ),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z=9", "utm_source=x", "gclid=7", "q=a+b"]
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "top", "x?y"]),
)


@settings(deadline=None, max_examples=30, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(url=_URL_STRATEGY)
def test_canonicalize_url_idempotent_property(spark, url):
    df = spark.createDataFrame([(url,)], "v string")
    row = df.select(
        T.canonicalize_url("v").alias("c1"),
        T.canonicalize_url(T.canonicalize_url("v")).alias("c2"),
    ).collect()[0]
    assert row["c1"] == row["c2"]
    # canonical form keeps scheme+host lowercase, no fragment,
    # no default port, no tracking params
    c = row["c1"]
    assert "#" not in c
    assert "utm_" not in c and "gclid" not in c
    host = c.split("://")[1].split("/")[0]
    assert host == host.lower()
    # only the SCHEME'S OWN default port is stripped (http://h:443
    # legitimately keeps the port)
    scheme = c.split("://")[0]
    default = ":80" if scheme == "http" else ":443"
    assert not host.endswith(default)


def test_canonicalize_url_idna_hosts(spark):
    """idna_hosts=True folds Unicode hosts to punycode (ACE) via the
    stdlib-idna Arrow kernel; ASCII URLs are byte-identical to the
    codegen-only path, and the fold is idempotent (ACE is ASCII)."""
    cases = {
        # the q194 arm: uppercase Unicode host + default port +
        # tracking param — all normalizations compose
        "https://BÜcher.Example:443/p/9?utm_medium=e&q=1":
            "https://xn--bcher-kva.example/p/9?q=1",
        # already-ACE host passes through the kernel unchanged
        "https://xn--bcher-kva.example/p/9?q=1":
            "https://xn--bcher-kva.example/p/9?q=1",
        # ASCII host: identical to the pure-codegen path
        "HTTPS://Shop.Example:443/p/9?utm_source=ad&b=2&a=1#frag":
            "https://shop.example/p/9?a=1&b=2",
        # non-web passthrough survives the flag
        "shop.example/no-scheme": "shop.example/no-scheme",
        # a host the idna codec rejects (empty label) folds to
        # itself — the operator folds, it does not validate
        "https://bü..example/x": "https://bü..example/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [
        r["out"]
        for r in df.select(
            T.canonicalize_url("v", idna_hosts=True).alias("out")
        ).collect()
    ]
    assert got == list(cases.values())
    # idempotence through the kernel path
    got2 = [
        r["out"]
        for r in df.select(
            T.canonicalize_url(
                T.canonicalize_url("v", idna_hosts=True), idna_hosts=True
            ).alias("out")
        ).collect()
    ]
    assert got2 == got


@settings(deadline=None, max_examples=20, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(host=st.lists(
    st.sampled_from(
        ["bücher", "shop", "münchen", "x1", "ärger", "example", "XN--a"]
    ),
    min_size=1, max_size=3,
))
def test_idna_kernel_matches_stdlib_property(spark, host):
    """The Arrow kernel agrees with a direct stdlib encodings.idna
    reference on random multi-label hosts (including the ASCII
    fast path and codec-rejected inputs)."""
    h = ".".join(host)
    try:
        ref = h.encode("idna").decode("ascii") if not h.isascii() else h
    except UnicodeError:
        ref = h
    df = spark.createDataFrame([(h,)], "v string")
    got = df.select(T.idna_host_udf()(F.col("v")).alias("out")).collect()
    assert got[0]["out"] == ref


def test_idna_2003_eszett_divergence_pinned(spark):
    """Round-13 pin of the documented IDNA 2003 vs UTS-46/IDNA 2008
    divergence (see idna_host_udf docstring): stdlib nameprep folds
    ß -> ss, so straße.example lands on strasse.example — browsers
    under UTS-46 non-transitional keep ß as its own ACE label
    (xn--strae-oqa.example). The 2003 behavior merges (never splits)
    dedup keys, the safe direction; this test documents the choice
    and will flag any future codec swap."""
    got = _one(
        spark, T.idna_host_udf()(F.col("v")), "straße.example"
    )
    assert got == "strasse.example"
    # ZWNJ (U+200C) is deleted by nameprep (CONTEXTJ-valid in
    # IDNA 2008) — written escaped; the char is invisible:
    got = _one(
        spark, T.idna_host_udf()(F.col("v")), "b\u00fc\u200ccher.example"
    )
    assert got == "xn--bcher-kva.example"


def test_idna_uts46_flag(spark):
    """Round 15: the UTS-46 flag the round-13 decision reserved
    ('if it lands, thread it here behind a flag') \u2014 the environment
    now ships the third-party idna package. uts46=True folds per
    UTS-46 NON-TRANSITIONAL + IDNA 2008 (modern-browser parity):
    the eszett deviation label keeps its own ACE form instead of
    nameprep's ss-fold, CONTEXTJ-valid ZWNJ is preserved in the ACE,
    CONTEXTJ-invalid joiners pass through unchanged (fold, don't
    validate), and the fold stays idempotent."""
    import pytest

    pytest.importorskip("idna")
    fold = T.idna_host_udf(uts46=True)
    # eszett: browser behavior, diverging from the pinned 2003 path
    assert (
        _one(spark, fold(F.col("v")), "stra\u00dfe.example")
        == "xn--strae-oqa.example"
    )
    # plain Unicode host folds the same as 2003
    assert (
        _one(spark, fold(F.col("v")), "B\u00dccher.Example")
        == "xn--bcher-kva.example"
    )
    # CONTEXTJ-valid ZWNJ (Persian) is PRESERVED in the ACE form \u2014
    # nameprep would delete it (different label!)
    zwnj_host = "\u0646\u0627\u0645\u0647\u200c\u0627\u06cc.example"
    got = _one(spark, fold(F.col("v")), zwnj_host)
    assert got == "xn--mgba3gch31f060k.example"
    assert (
        _one(spark, T.idna_host_udf()(F.col("v")), zwnj_host)
        == "xn--mgba3gch31f.example"  # 2003 deletes the joiner
    )
    # CONTEXTJ-invalid joiner: codec rejects -> unchanged passthrough
    bad = "b\u200ccher.example"
    assert _one(spark, fold(F.col("v")), bad) == bad
    # idempotent: ACE output is ASCII -> second pass is the fast path
    assert (
        _one(spark, fold(F.col("v")), "xn--strae-oqa.example")
        == "xn--strae-oqa.example"
    )
    # and the canonicalize_url passthrough wires it end-to-end
    assert _one(
        spark,
        T.canonicalize_url("v", idna_hosts=True, uts46=True),
        "http://stra\u00dfe.example/a",
    ) == "http://xn--strae-oqa.example/a"


def test_idna_mixed_batch_vectorized_prefilter(spark):
    """The kernel's vectorized non-ASCII pre-filter: a batch mixing
    ASCII rows, nulls, and foldable hosts returns each correctly
    (ASCII + null untouched, non-ASCII folded)."""
    rows = [("shop.example",), (None,), ("bücher.example",), ("",)]
    df = spark.createDataFrame(rows, "v string")
    got = [
        r["out"]
        for r in df.coalesce(1)
        .select(T.idna_host_udf()(F.col("v")).alias("out"))
        .collect()
    ]
    assert got == ["shop.example", None, "xn--bcher-kva.example", ""]


def test_percent_normalize_multibyte_stays_encoded(spark):
    """Round-13 pin of the percent-decode DECISION (see
    percent_normalize docstring): multi-byte UTF-8 escapes are NOT
    decoded — %C3%A9 ('é') stays encoded (hex uppercased), %2F
    (reserved '/') stays encoded, while unreserved %41 decodes."""
    cases = {
        "/caf%c3%a9": "/caf%C3%A9",       # multi-byte: kept, upcased
        "/caf%C3%A9": "/caf%C3%A9",       # idempotent
        "/a%2fb": "/a%2Fb",               # reserved: kept, upcased
        "/%41%62c": "/Abc",               # unreserved: decoded
        "/café": "/café",       # raw é: untouched (distinct
                                          # key from the encoded form,
                                          # by design)
    }
    for raw, want in cases.items():
        assert _one(spark, T.percent_normalize(F.col("v")), raw) == want


def test_url_host(spark):
    cases = {
        "https://Shop.Example:8443/p": "shop.example",
        "http://h.example/x?q=1": "h.example",
        "shop.example/no-scheme": "",
        "": "",
        # round-12: userinfo/bracket authorities abstain ('' beats
        # reporting 'user' as a host-grouping key)
        "http://user:pw@h.example/": "",
        "http://[::1]:8080/x": "",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [r["out"] for r in df.select(T.url_host("v").alias("out")).collect()]
    assert got == list(cases.values())


# ------------------------------------------------------------- Unicode

# the q25 confusables suffixes and their oracle constants
# (arm: suffix, n_ctrl, nfc_len, nfkc_len, nfc_changed)
_Q25_SUFFIXES = {
    1: (" Cafe\u0301", 0, 5, 5, True),
    2: (" \ufb01le \uff12\uff13", 0, 7, 8, False),
    3: (" \x07\x1b\u2116\u2460", 2, 3, 4, False),
    4: (" \u212b\u00bc", 0, 3, 5, True),
}


def test_q25_suffix_constants_match_unicodedata():
    """The q25 oracle's closed-form NFKC deltas are exactly stdlib
    unicodedata over the control-stripped suffixes."""
    import re

    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    for arm, (suf, n_ctrl, nfc_len, nfkc_len, changed) in _Q25_SUFFIXES.items():
        stripped = ctrl.sub("", suf)
        assert len(suf) - len(stripped) == n_ctrl, arm
        nfc = unicodedata.normalize("NFC", stripped)
        nfkc = unicodedata.normalize("NFKC", stripped)
        assert len(nfc) == nfc_len, arm
        assert len(nfkc) == nfkc_len, arm
        assert (nfc != stripped) is changed, arm


def test_unicode_normalize_kernel(spark):
    df = spark.createDataFrame(
        [(suf,) for suf, *_ in _Q25_SUFFIXES.values()], "v string"
    )
    rows = df.select(
        "v",
        T.unicode_normalize_udf("NFC")(T.strip_controls("v")).alias("nfc"),
        T.unicode_normalize_udf("NFKC")(T.strip_controls("v")).alias("nfkc"),
        T.control_char_count("v").alias("nc"),
    ).collect()
    import re

    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    for r in rows:
        stripped = ctrl.sub("", r["v"])
        assert r["nfc"] == unicodedata.normalize("NFC", stripped)
        assert r["nfkc"] == unicodedata.normalize("NFKC", stripped)
        assert r["nc"] == len(r["v"]) - len(stripped)


def test_unicode_normalize_rejects_bad_form():
    import pytest

    with pytest.raises(ValueError):
        T.unicode_normalize_udf("NFX")


@settings(deadline=None, max_examples=20, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    s=st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FFF
        ),
        max_size=40,
    )
)
def test_unicode_idempotence_and_composition_property(spark, s):
    """norm(norm(x)) == norm(x) and NFC(NFKC(x)) == NFKC(x) through
    the Arrow kernel (the properties the hygiene chain relies on)."""
    df = spark.createDataFrame([(s,)], "v string")
    nfc = T.unicode_normalize_udf("NFC")
    nfkc = T.unicode_normalize_udf("NFKC")
    row = df.select(
        nfc(F.col("v")).alias("c1"),
        nfc(nfc(F.col("v"))).alias("c2"),
        nfkc(F.col("v")).alias("k1"),
        nfkc(nfkc(F.col("v"))).alias("k2"),
        nfc(nfkc(F.col("v"))).alias("ck"),
    ).collect()[0]
    assert row["c1"] == row["c2"]
    assert row["k1"] == row["k2"]
    assert row["ck"] == row["k1"]


@settings(deadline=None, max_examples=20, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    s=st.text(
        alphabet=st.characters(
            # min_codepoint=1: NUL is excluded because DuckDB's
            # nfc_normalize (utf8proc) has a NUL-path edge where some
            # leading-NUL sequences come back empty ('\x00\x80' -> '')
            # while the Unicode answer is the identity; the engines
            # legitimately diverge there. See the pinned divergence
            # test below. No driver query is exposed: strip_controls
            # removes \x00 upstream of every NFC call in the hygiene
            # chain, and the q25 corpus is NUL-free.
            blacklist_categories=("Cs",), min_codepoint=1,
            max_codepoint=0xFFFD
        ),
        max_size=40,
    )
)
def test_nfc_kernel_matches_duckdb_property(spark, s):
    """Round-12: the Arrow NFC kernel diffed against DuckDB's
    nfc_normalize — a REAL second normalization engine — on random
    BMP codepoint strings (the q25 oracle's cross-engine contract,
    generalized from the pinned suffix constants). NUL excluded
    (round 13) — see the strategy comment and the pinned test."""
    import duckdb

    got = _one(spark, T.unicode_normalize_udf("NFC")(F.col("v")), s)
    ref = duckdb.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
    assert got == ref


def test_nfc_nul_divergence_pinned(spark):
    """Round-13 pin of the cross-engine DIVERGENCE that made the
    property above flaky: on '\\x00\\x80' the Arrow kernel returns the
    Unicode-correct identity (the string is already NFC), while
    DuckDB's nfc_normalize returns '' — a utf8proc NUL-path edge
    (interior NULs survive: 'a\\x00b' round-trips; this leading-NUL
    sequence empties). The kernel is right; the property therefore
    excludes NUL from its domain rather than over-claiming parity."""
    import duckdb

    s = "\x00\x80"
    got = _one(spark, T.unicode_normalize_udf("NFC")(F.col("v")), s)
    assert got == s  # Unicode: already NFC -> identity
    ref = duckdb.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
    # DuckDB's utf8proc edge: if this ever starts round-tripping,
    # the engines agree again and NUL can rejoin the property domain.
    assert ref in ("", s)
    # Interior NUL survives in BOTH engines (shows the edge is
    # specifically the leading-NUL sequence, not NUL handling per se).
    assert _one(spark, T.unicode_normalize_udf("NFC")(F.col("v")), "a\x00b") == "a\x00b"
    assert duckdb.execute(
        "SELECT nfc_normalize(?)", ["a\x00b"]
    ).fetchone()[0] == "a\x00b"


def test_strip_controls_keeps_tab_newline_cr(spark):
    assert (
        _one(spark, T.strip_controls(F.col("v")), "a\tb\nc\rd\x00e\x7ff")
        == "a\tb\nc\rd" + "ef"
    )

"""WARC record walk (sources/warc.py): roundtrip, framing damage,
bit-flip contract, HTTP payload split, and the Spark mapInPandas
extractor end-to-end (the q65 step -1 container leg)."""

from __future__ import annotations

import gzip

import pytest

from e_commerce_data_pipeline_spark.sources.warc import (
    build_warc,
    decode_http_body,
    extract_warc_responses,
    parse_warc,
    prescan_meta_charset,
    sniff_bom,
    sniff_charset,
    split_http_response,
)


def _http_payload(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(body)}".encode()
        + b"\r\n\r\n"
        + body
    )


def _records(n=3):
    recs = []
    for i in range(n):
        body = f"<html><body><p>doc {i} &amp; more</p></body></html>".encode()
        recs.append(
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:doc:{i}>",
                    "WARC-Target-URI": f"https://corpus.example/doc/{i}",
                    "Content-Type": "application/http; msgtype=response",
                    "X-Doc-Lang": "en",
                },
                "payload": _http_payload(body),
            }
        )
    return recs


# ------------------------------------------------------------ roundtrip


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = build_warc(_records(), gzip_members=gz)
    recs = parse_warc(data)
    # warcinfo + 3 responses
    assert len(recs) == 4
    assert recs[0][0]["warc-type"] == "warcinfo"
    for i, (h, payload) in enumerate(recs[1:]):
        assert h["warc-type"] == "response"
        assert h["warc-record-id"] == f"<urn:doc:{i}>"
        assert h["x-doc-lang"] == "en"
        status, http, body = split_http_response(payload)
        assert status.startswith("HTTP/1.1 200")
        assert http["content-type"].startswith("text/html")
        assert f"doc {i}".encode() in body


def test_gzip_members_are_individually_seekable():
    """The .warc.gz layout is one gzip MEMBER per record — each must
    decompress standalone (the spec's seekability guarantee)."""
    data = build_warc(_records(1), gzip_members=True)
    # find the second member's magic; the first member must
    # decompress standalone
    idx = data.find(b"\x1f\x8b", 2)
    assert idx > 0  # two members: warcinfo + one response
    one = gzip.decompress(data[:idx])
    assert one.startswith(b"WARC/1.0\r\n")


def test_build_warc_deterministic():
    assert build_warc(_records()) == build_warc(_records())
    assert build_warc(_records(), gzip_members=True) == build_warc(
        _records(), gzip_members=True
    )


# --------------------------------------------------------------- damage


def test_truncation_raises():
    data = build_warc(_records())
    for cut in (len(data) - 1, len(data) // 2, 10):
        with pytest.raises(ValueError):
            parse_warc(data[:cut])


def test_forged_content_length_raises():
    data = build_warc(_records(1))
    forged = data.replace(b"Content-Length: 5", b"Content-Length: 99999", 1)
    # if the exact fragment wasn't present, forge the first CL line
    if forged == data:
        import re

        forged = re.sub(
            rb"Content-Length: \d+", b"Content-Length: 999999", data, count=1
        )
    with pytest.raises(ValueError):
        parse_warc(forged)


def test_bad_version_line_raises():
    data = build_warc(_records(1))
    with pytest.raises(ValueError):
        parse_warc(data.replace(b"WARC/1.0", b"WARC/9.9", 1))
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_missing_terminator_raises():
    rec = _records(1)[0]
    data = build_warc([rec], warcinfo=False)
    assert data.endswith(b"\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(data[:-4] + b"XXXX")


def test_torn_gzip_member_raises():
    data = build_warc(_records(1), gzip_members=True)
    with pytest.raises(ValueError):
        parse_warc(data[: len(data) - 6])


def test_http_split_damage_raises():
    with pytest.raises(ValueError):
        split_http_response(b"HTTP/1.1 200 OK\r\nno-terminator")
    with pytest.raises(ValueError):
        split_http_response(b"FTP/1.1 200\r\n\r\nbody")
    with pytest.raises(ValueError):
        split_http_response(b"HTTP/1.1 200 OK\r\nbadline\r\n\r\nbody")


def test_empty_and_nonbytes_raise():
    with pytest.raises(ValueError):
        parse_warc(b"")
    with pytest.raises(ValueError):
        parse_warc("not bytes")  # type: ignore[arg-type]


def test_bitflip_sweep_plain_and_gzip():
    """Bit-flip contract (the multimodal house rule): every single-bit
    corruption of the stream either still parses or raises ValueError
    — never IndexError/KeyError/MemoryError. UnicodeDecodeError is a
    ValueError subclass and counts."""
    for gz in (False, True):
        data = bytearray(build_warc(_records(2), gzip_members=gz))
        for byte_i in range(len(data)):
            for bit in (0x01, 0x80):
                data[byte_i] ^= bit
                try:
                    parse_warc(bytes(data))
                except ValueError:
                    pass
                data[byte_i] ^= bit


# -------------------------------------------------------------- charset


def test_sniff_charset_spellings():
    """Every spelling real crawls carry: bare, quoted, single-quoted,
    case-folded name+label, parameter whitespace, trailing params."""
    assert sniff_charset({"content-type": "text/html; charset=utf-8"}) == "utf-8"
    assert (
        sniff_charset({"content-type": 'text/html; charset="ISO-8859-1"'})
        == "iso-8859-1"
    )
    assert (
        sniff_charset({"content-type": "text/html; charset='Shift_JIS'"})
        == "shift_jis"
    )
    assert (
        sniff_charset({"content-type": "text/html; CHARSET = Windows-1252"})
        == "windows-1252"
    )
    assert (
        sniff_charset(
            {"content-type": "text/html; charset=EUC-JP; boundary=x"}
        )
        == "euc-jp"
    )
    assert sniff_charset({"content-type": "text/html"}) is None
    assert sniff_charset({}) is None
    assert sniff_charset({"content-type": "text/html; charset="}) is None


def test_decode_http_body_policy():
    """The documented corpus-walker decode policy: declared-charset
    strict decode is clean; unknown labels fall back to utf-8 and
    are NOT clean; undecodable bytes replace + flag, never raise."""
    # declared latin-1, non-ASCII byte -> exact recovery, clean;
    # the label folds to windows-1252 per the WHATWG Encoding
    # Standard (cp1252 == latin-1 on this byte range)
    txt, cs, clean = decode_http_body(
        "café".encode("latin-1"),
        {"content-type": "text/html; charset=ISO-8859-1"},
    )
    assert (txt, cs, clean) == ("café", "windows-1252", True)
    # the fold is WHY: a declared-latin-1 page carrying cp1252
    # smart quotes (0x93/0x94) decodes to the quotes browsers show,
    # not to C1 control chars
    txt, cs, clean = decode_http_body(
        b"\x93quoted\x94 \x97 dash",
        {"content-type": "text/html; charset=latin1"},
    )
    assert (txt, cs, clean) == ("“quoted” — dash",
                                "windows-1252", True)
    # ...and the five cp1252-undefined bytes take the replace+flag
    # path rather than silently mapping to controls
    txt, cs, clean = decode_http_body(
        b"x\x81y", {"content-type": "text/html; charset=iso-8859-1"}
    )
    assert cs == "windows-1252" and clean is False and "�" in txt
    # declared shift_jis katakana
    txt, cs, clean = decode_http_body(
        "アイウ".encode("shift_jis"),
        {"content-type": "text/html; charset=Shift_JIS"},
    )
    assert (txt, cs, clean) == ("アイウ", "shift_jis", True)
    # absent header -> utf-8 default, clean when bytes are valid
    txt, cs, clean = decode_http_body("✓ ok".encode(), {})
    assert (txt, cs, clean) == ("✓ ok", "utf-8", True)
    # unknown label -> utf-8 fallback, flagged unclean even if bytes
    # happen to decode (the declaration was unusable)
    txt, cs, clean = decode_http_body(
        b"plain ascii", {"content-type": "text/html; charset=unicode"}
    )
    assert (txt, cs, clean) == ("plain ascii", "utf-8", False)
    # latin-1 bytes WITHOUT a declaration: invalid utf-8 -> replace
    # + unclean, and the row survives (policy: bad page is data)
    txt, cs, clean = decode_http_body("café".encode("latin-1"), {})
    assert cs == "utf-8" and clean is False and "caf" in txt
    assert "�" in txt


def test_sniff_bom():
    assert sniff_bom(b"\xef\xbb\xbfhello") == ("utf-8", 3)
    assert sniff_bom(b"\xfe\xff\x00h") == ("utf-16-be", 2)
    assert sniff_bom(b"\xff\xfeh\x00") == ("utf-16-le", 2)
    assert sniff_bom(b"hello") is None
    assert sniff_bom(b"") is None
    # a BOM not at offset 0 is content, not a mark
    assert sniff_bom(b" \xef\xbb\xbf") is None


def test_prescan_meta_charset():
    assert (
        prescan_meta_charset(b"<meta charset=shift_jis><p>x</p>")
        == "shift_jis"
    )
    # http-equiv form: the charset= lives inside the content attr
    assert (
        prescan_meta_charset(
            b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=EUC-JP"></head>'
        )
        == "euc-jp"
    )
    # quoted / spaced spellings
    assert (
        prescan_meta_charset(b"<META CHARSET = 'UTF-8'>") == "utf-8"
    )
    # beyond the 1024-byte window -> not found
    assert (
        prescan_meta_charset(b"x" * 1024 + b"<meta charset=utf-8>")
        is None
    )
    # a utf-16 label in ASCII-readable bytes is a lie -> utf-8
    assert prescan_meta_charset(b"<meta charset=utf-16>") == "utf-8"
    # entity-escaped text can't match the raw tag
    assert prescan_meta_charset(b"&lt;meta charset=koi8-r&gt;") is None
    assert prescan_meta_charset(b"<p>plain</p>") is None
    # a tag whose name merely STARTS with 'meta' must not hijack
    # charset resolution (r14 self-review: <metadata> in SVG-style
    # markup resolved koi8-r and silently mojibake'd a utf-8 page)
    assert prescan_meta_charset(b"<metadata charset=koi8-r>x") is None
    # ...but the WHATWG-legal self-closing spelling still matches
    assert prescan_meta_charset(b"<meta/charset=utf-8>") == "utf-8"


def test_prescan_attribute_name_boundary():
    """An attribute name merely ENDING in 'charset' must not hijack
    the decode (r15 advice): before the lookbehind, data-charset=
    koi8-r resolved koi8-r for a utf-8 page whose header carried no
    charset — clean=True with the wrong codec."""
    assert (
        prescan_meta_charset(b'<meta name=x data-charset="koi8-r">')
        is None
    )
    assert prescan_meta_charset(b"<meta x_charset=koi8-r>") is None
    # '.' and ':' are legal attribute-name characters too (r15
    # review: the first lookbehind class missed them)
    assert prescan_meta_charset(b"<meta xml:charset=koi8-r>") is None
    assert prescan_meta_charset(b"<meta x.charset=koi8-r>") is None
    # a later REAL declaration in the same tag still wins
    assert (
        prescan_meta_charset(
            b'<meta data-charset="koi8-r" charset="utf-8">'
        )
        == "utf-8"
    )
    # and a real declaration in a following tag is still found
    assert (
        prescan_meta_charset(
            b"<meta data-charset=koi8-r><meta charset=shift_jis>"
        )
        == "shift_jis"
    )


def test_prescan_utf16_label_spellings():
    """All utf-16-family spellings fold to utf-8 (r15 advice): the
    prescan read the bytes as ASCII-compatible, so ANY utf-16 label
    is a lie — including hyphen/underscore variants and the WHATWG
    BOM-name aliases that previously slipped through to
    codecs.lookup and decoded the page as mojibake."""
    for label in (
        b"utf-16", b"utf-16le", b"utf-16be", b"utf16",
        b"utf-16-le", b"utf-16-be", b"utf_16", b"utf_16_le",
        b"unicodefffe", b"unicodefeff",
    ):
        body = b"<meta charset=" + label + b">"
        assert prescan_meta_charset(body) == "utf-8", label
    # non-utf-16 labels still pass through untouched
    assert prescan_meta_charset(b"<meta charset=utf-8>") == "utf-8"
    assert (
        prescan_meta_charset(b"<meta charset=koi8-r>") == "koi8-r"
    )


def test_decode_rejects_python_only_unicode_codecs():
    """utf-7 and utf-32 labels resolve in Python's registry but are
    NOT WHATWG encodings (r15 review): utf-7 silently TRANSFORMS
    ascii-visible text (+ADw- -> '<') and utf-32 decodes an
    ascii-compatible page as mojibake — both must take the
    unknown-label path (utf-8 + clean=False), wherever declared."""
    from e_commerce_data_pipeline_spark.sources.warc import (
        decode_http_body,
    )

    body = b"<html><meta charset=utf-7><p>+ADw-not a tag+AD4-</p></html>"
    text, charset, clean = decode_http_body(body, {})
    assert charset == "utf-8" and clean is False
    assert "+ADw-" in text  # NOT transformed into '<'
    for label in (b"utf-32", b"utf32", b"utf-32le", b"utf_32_be"):
        b2 = b"<html><meta charset=" + label + b"><p>plain</p></html>"
        text, charset, clean = decode_http_body(b2, {})
        assert charset == "utf-8" and clean is False, label
        assert "plain" in text, label
    # header-declared variants take the same path
    hdr = {"content-type": "text/html; charset=utf-7"}
    text, charset, clean = decode_http_body(b"abc +ADw-x+AD4-", hdr)
    assert (charset, clean) == ("utf-8", False) and "+ADw-" in text
    # Python short codec aliases (r16 advice): codecs.lookup resolves
    # 'u7'->utf-7, 'u16'->utf-16, 'u32'->utf-32, but none is a WHATWG
    # label — charset=u16 must NOT decode ascii bytes as utf-16
    for label in (b"u7", b"u16", b"u32", b"U16", b"unicode-1-1-utf-7"):
        for h, b in (
            ({"content-type": b"text/html; charset=" + label}, b"plain"),
            ({}, b"<html><meta charset=" + label + b"><p>plain</p>"),
        ):
            hh = {
                k: v.decode() if isinstance(v, bytes) else v
                for k, v in h.items()
            }
            text, charset, clean = decode_http_body(b, hh)
            assert (charset, clean) == ("utf-8", False), (label, h)
            assert "plain" in text, (label, h)
    # header-declared utf-16 (BOM-less) is a REAL WHATWG encoding and
    # still decodes as utf-16 — only the prescan remaps utf-16 labels
    t16 = "hi".encode("utf-16-le")
    text, charset, clean = decode_http_body(
        t16, {"content-type": "text/html; charset=utf-16le"}
    )
    assert charset == "utf-16le" and text == "hi" and clean is True


def test_prescan_documented_false_positive_modes():
    """Pin the DOCUMENTED simplifications (r14 verdict #6) so a
    future 'fix' can't silently change decode semantics the q65
    oracle synthesis mirrors: (a) no comment-context exclusion — a
    <meta charset=> inside an HTML comment in the first 1 KiB WINS;
    (b) the window is a hard 1024-byte byte cut — a declaration
    STRADDLING the boundary is not found."""
    assert (
        prescan_meta_charset(
            b"<!-- <meta charset=koi8-r> --><meta charset=utf-8>"
        )
        == "koi8-r"
    )
    # the 1024-byte cut falls right after 'charset=' (no value
    # bytes visible) -> no match; '<meta charset=' is 14 bytes
    assert (
        prescan_meta_charset(b"x" * 1010 + b"<meta charset=shift_jis>")
        is None
    )
    # the cut falls MID-VALUE -> the truncated label is returned
    # as-is ('shift'); decode_http_body then treats it as unknown
    # (utf-8 + clean=False) — lossy but loud, and pinned so a
    # future window rework can't silently change it
    assert (
        prescan_meta_charset(b"x" * 1005 + b"<meta charset=shift_jis>")
        == "shift"
    )
    # entirely inside the window -> found whole
    assert (
        prescan_meta_charset(b"x" * 1000 + b"<meta charset=shift_jis>")
        == "shift_jis"
    )


def test_whatwg_sniff_order():
    """BOM > transport header > meta prescan > utf-8 default — and
    the BOM is STRIPPED (a kept BOM decodes to a stray U+FEFF)."""
    # BOM beats a contradicting header
    txt, cs, clean = decode_http_body(
        b"\xef\xbb\xbf" + "✓ BOM".encode(),
        {"content-type": "text/html; charset=shift_jis"},
    )
    assert (txt, cs, clean) == ("✓ BOM", "utf-8", True)
    assert "\ufeff" not in txt
    # utf-16-le BOM: undecodable as utf-8, exact via the sniff
    txt, cs, clean = decode_http_body(
        b"\xff\xfe" + "✓ ∑ wide".encode("utf-16-le"), {}
    )
    assert (txt, cs, clean) == ("✓ ∑ wide", "utf-16-le", True)
    txt, cs, clean = decode_http_body(
        b"\xfe\xff" + "✓ be".encode("utf-16-be"), {}
    )
    assert (txt, cs, clean) == ("✓ be", "utf-16-be", True)
    # header beats meta when both are present
    txt, cs, clean = decode_http_body(
        "<meta charset=shift_jis><p>café</p>".encode("cp1252"),
        {"content-type": "text/html; charset=ISO-8859-1"},
    )
    assert (txt, cs, clean) == (
        "<meta charset=shift_jis><p>café</p>", "windows-1252", True
    )
    # meta applies when the header carries no charset param
    body = "<meta charset=shift_jis><p>カキク</p>".encode("shift_jis")
    txt, cs, clean = decode_http_body(
        body, {"content-type": "text/html"}
    )
    assert (txt, cs, clean) == (
        "<meta charset=shift_jis><p>カキク</p>", "shift_jis", True
    )
    # meta labels get the WHATWG cp1252 fold like header labels
    txt, cs, clean = decode_http_body(
        "<meta charset=latin1>\x93q\x94".encode("latin-1"), {}
    )
    assert cs == "windows-1252" and clean is True and "“q”" in txt
    # unknown meta label -> utf-8 fallback, flagged
    txt, cs, clean = decode_http_body(
        b"<meta charset=unicode>ascii", {}
    )
    assert (cs, clean) == ("utf-8", False)
    # a label naming a REGISTERED bytes-to-bytes codec (hex, base64,
    # zlib, rot13) passes codecs.lookup but str.decode raises
    # LookupError — must flag, never raise (r14 self-review)
    for lie in ("hex", "base64", "zlib", "rot13", "quopri"):
        txt, cs, clean = decode_http_body(
            b"wild data", {"content-type": f"text/html; charset={lie}"}
        )
        assert (cs, clean) == ("utf-8", False), lie
    txt, cs, clean = decode_http_body(b"<meta charset=hex>page", {})
    assert (cs, clean) == ("utf-8", False)
    # torn BOM'd utf-16 body: replace + flag, never raise
    txt, cs, clean = decode_http_body(
        b"\xff\xfe" + "✓".encode("utf-16-le")[:-1], {}
    )
    assert cs == "utf-16-le" and clean is False
    # WHATWG x-user-defined: no Python codec, 0x80+ -> U+F780+,
    # always clean (every byte maps)
    txt, cs, clean = decode_http_body(
        b"abc\x80\xff",
        {"content-type": "text/html; charset=x-user-defined"},
    )
    assert (txt, cs, clean) == (
        "abc", "x-user-defined", True
    )


def test_decode_http_body_never_raises_fuzz():
    """The corpus-walker posture, fuzzed: for ANY body bytes and ANY
    Content-Type header (including BOM fragments, lying meta tags,
    torn multi-byte sequences), decode_http_body returns
    (str, str, bool) — a bad page is flagged data, never an
    exception. Derandomized like every hypothesis suite."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    boms = st.sampled_from(
        [b"", b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff", b"\xff", b"\xef\xbb"]
    )
    cts = st.sampled_from(
        [
            None,
            "text/html",
            "text/html; charset=utf-8",
            "text/html; charset=shift_jis",
            "text/html; charset=unicode",
            "text/html; charset=ISO-8859-1",
            "text/html; charset=hex",
            "text/html; charset=base64",
        ]
    )

    @settings(
        deadline=None,
        max_examples=60,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(boms, st.binary(max_size=300), cts)
    def inner(bom, payload, ct):
        hdrs = {} if ct is None else {"content-type": ct}
        txt, cs, clean = decode_http_body(bom + payload, hdrs)
        assert isinstance(txt, str)
        assert isinstance(cs, str) and cs
        assert isinstance(clean, bool)

    inner()


def _charset_records():
    """One response per declaration channel the WHATWG sniff order
    covers — Content-Type header spellings (r13), then BOM'd utf-8,
    meta-prescan-only shift_jis, and BOM'd utf-16-le (r14) — each
    with a charset-native non-ASCII body, the mixed-charset shape of
    a real crawl file."""
    cases = [
        ("utf-8", b"", "text/html", "<p>✓ doc zero</p>"),
        ("latin-1", b"", 'text/html; charset="ISO-8859-1"',
         "<p>café ±é</p>"),
        ("shift_jis", b"", "text/html; CHARSET=Shift_JIS",
         "<p>アイウ</p>"),
        ("utf-8", b"\xef\xbb\xbf", "text/html", "<p>✓ BOM’d</p>"),
        ("shift_jis", b"", "text/html",
         "<meta charset=shift_jis><p>カキク</p>"),
        ("utf-16-le", b"\xff\xfe", "text/html", "<p>✓ ∑ utf-16</p>"),
    ]
    recs = []
    for i, (codec, bom, ct, html) in enumerate(cases):
        body = bom + html.encode(codec)
        recs.append(
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:doc:{i}>",
                    "WARC-Target-URI": f"https://corpus.example/doc/{i}",
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": (
                    b"HTTP/1.1 200 OK\r\n"
                    + f"Content-Type: {ct}".encode("ascii")
                    + b"\r\n"
                    + f"Content-Length: {len(body)}".encode("ascii")
                    + b"\r\n\r\n"
                    + body
                ),
            }
        )
    return recs, [c[3] for c in cases]


@pytest.mark.parametrize("gz", [False, True])
def test_extract_mixed_charsets_spark(spark, gz):
    """End-to-end: a mixed-charset WARC file (the q65 rounds-13/14
    fold shape — header, BOM, and meta declaration channels)
    recovers every body exactly (BOMs stripped), all decode_clean."""
    import pandas as pd

    recs, htmls = _charset_records()
    data = build_warc(recs, gzip_members=gz)
    df = spark.createDataFrame(pd.DataFrame({"warc": [data]}))
    out = sorted(
        extract_warc_responses(df, "warc").collect(),
        key=lambda r: r["record_id"],
    )
    assert [r["html"] for r in out] == htmls
    assert all(r["decode_clean"] for r in out)
    assert [r["charset"] for r in out] == [
        "utf-8", "windows-1252", "shift_jis",
        "utf-8", "shift_jis", "utf-16-le",
    ]


def test_extract_undeclared_latin1_flags_not_raises(spark):
    """A latin-1 page with NO charset declaration must survive as a
    flagged row (replace policy), not kill the file's task."""
    import pandas as pd

    rec = {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:doc:9>",
            "WARC-Target-URI": "https://corpus.example/doc/9",
            "Content-Type": "application/http; msgtype=response",
        },
        "payload": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + "caf\xe9".encode("latin-1")
        ),
    }
    df = spark.createDataFrame(
        pd.DataFrame({"warc": [build_warc([rec])]})
    )
    out = extract_warc_responses(df, "warc").collect()
    assert len(out) == 1
    assert out[0]["decode_clean"] is False
    assert "�" in out[0]["html"]


# ---------------------------------------------------------- body layers


def test_dechunk_http_body():
    from e_commerce_data_pipeline_spark.sources.warc import (
        dechunk_http_body,
    )

    body = "café hello ✓ world ".encode() * 7
    # multi-chunk with an extension and a trailer header
    ck = (
        b"5;x=1\r\n" + body[:5] + b"\r\n"
        + f"{len(body) - 5:x}".encode() + b"\r\n" + body[5:] + b"\r\n"
        + b"0\r\nX-Trailer: v\r\n\r\n"
    )
    assert dechunk_http_body(ck) == body
    # bare terminator, uppercase hex
    ck2 = (
        f"{len(body):X}".encode() + b"\r\n" + body + b"\r\n0\r\n\r\n"
    )
    assert dechunk_http_body(ck2) == body
    for bad in (
        ck[:-4],                       # truncated trailer
        b"zz\r\nxx\r\n0\r\n\r\n",      # non-hex size
        b"-5\r\nxxxxx\r\n0\r\n\r\n",   # negative size
        b"5\r\nab\r\n",                # chunk data truncated
        b"2\r\nabXX0\r\n\r\n",         # missing chunk CRLF
        ck + b"junk",                  # data after final chunk
        # non-RFC spellings Python's int(tok, 16) would accept —
        # corrupted framing must flag, not silently parse (r14)
        b"+5\r\nabcde\r\n0\r\n\r\n",   # signed size
        b"1_0\r\n" + b"x" * 16 + b"\r\n0\r\n\r\n",  # underscore
        b"0x5\r\nabcde\r\n0\r\n\r\n",  # 0x prefix
        b"\r\nab\r\n0\r\n\r\n",        # empty size token
    ):
        with pytest.raises(ValueError):
            dechunk_http_body(bad)


def test_decode_content_encoding():
    import zlib

    from e_commerce_data_pipeline_spark.sources.warc import (
        decode_content_encoding,
    )

    body = "deflate ✓ café".encode() * 5
    assert decode_content_encoding(body, "identity") == body
    assert decode_content_encoding(body, "") == body
    assert decode_content_encoding(gzip.compress(body), "gzip") == body
    assert decode_content_encoding(gzip.compress(body), "x-gzip") == body
    assert decode_content_encoding(zlib.compress(body), "deflate") == body
    # the raw-deflate form broken servers send
    co = zlib.compressobj(wbits=-15)
    raw = co.compress(body) + co.flush()
    assert decode_content_encoding(raw, "deflate") == body
    # RFC 9110 §8.4 comma-separated coding lists: applied in order
    # on send, undone right-to-left; identity entries are no-ops
    assert decode_content_encoding(gzip.compress(body), "gzip, identity") == body
    assert decode_content_encoding(gzip.compress(body), "identity, gzip") == body
    assert (
        decode_content_encoding(
            gzip.compress(zlib.compress(body)), "deflate, gzip"
        )
        == body
    )
    with pytest.raises(ValueError):
        decode_content_encoding(b"xx", "br")
    with pytest.raises(ValueError):
        decode_content_encoding(b"xx", "gzip, br")
    with pytest.raises(ValueError):
        decode_content_encoding(gzip.compress(body)[:-3], "gzip")


def _layered_record(i, html, te=None, ce=None, body=None):
    hdrs = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    if ce:
        hdrs += f"Content-Encoding: {ce}".encode() + b"\r\n"
    if te:
        hdrs += f"Transfer-Encoding: {te}".encode() + b"\r\n"
    return {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:doc:{i}>",
            "WARC-Target-URI": f"https://corpus.example/doc/{i}",
            "Content-Type": "application/http; msgtype=response",
        },
        "payload": hdrs + b"\r\n" + (body if body is not None
                                     else html.encode()),
    }


def test_extract_body_layers_spark(spark):
    """End-to-end: chunked, gzip, deflate, and chunked-over-gzip
    bodies (the q65 round-13 body-layer arms) all recover the exact
    text with decode_clean=TRUE; torn layers FLAG, never kill."""
    import zlib

    import pandas as pd

    html = "<p>layered ✓ body café</p>" * 4

    def chunked(b):
        return (
            f"{len(b) - 7:x}".encode() + b";e=1\r\n" + b[:-7] + b"\r\n"
            + b"7\r\n" + b[-7:] + b"\r\n0\r\nX-T: 1\r\n\r\n"
        )

    recs = [
        _layered_record(0, html),
        _layered_record(1, html, te="chunked",
                        body=chunked(html.encode())),
        _layered_record(2, html, ce="gzip",
                        body=gzip.compress(html.encode())),
        _layered_record(3, html, te="chunked", ce="gzip",
                        body=chunked(gzip.compress(html.encode()))),
        _layered_record(4, html, ce="deflate",
                        body=zlib.compress(html.encode())),
        # torn chunk framing: flagged row, not a task failure
        _layered_record(5, html, te="chunked",
                        body=chunked(html.encode())[:-9]),
        # torn body gzip: flagged
        _layered_record(6, html, ce="gzip",
                        body=gzip.compress(html.encode())[:-3]),
        # unknown coding: flagged
        _layered_record(7, html, ce="br", body=b"\x00\x01"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"warc": [build_warc(recs)]})
    )
    out = {
        int(r["record_id"][9:-1]): r
        for r in extract_warc_responses(df, "warc").collect()
    }
    assert len(out) == 8
    for i in range(5):
        assert out[i]["decode_clean"] is True, i
        assert out[i]["html"] == html, i
    for i in (5, 6, 7):
        assert out[i]["decode_clean"] is False, i


# ---------------------------------------------------------------- spark


def test_extract_warc_responses_spark(spark):
    import pandas as pd

    plain = build_warc(_records(3), gzip_members=False)
    gzd = build_warc(_records(2), gzip_members=True)
    df = spark.createDataFrame(
        pd.DataFrame({"bucket": [0, 1], "warc": [plain, gzd]})
    )
    out = extract_warc_responses(df, "warc").collect()
    # warcinfo records skipped; 3 + 2 responses survive
    assert len(out) == 5
    ids = sorted(r["record_id"] for r in out)
    assert ids == [
        "<urn:doc:0>", "<urn:doc:0>", "<urn:doc:1>",
        "<urn:doc:1>", "<urn:doc:2>",
    ]
    for r in out:
        assert r["target_uri"].startswith("https://corpus.example/doc/")
        assert r["headers"]["x-doc-lang"] == "en"
        assert r["html"].startswith("<html><body><p>doc ")
        # the HTTP header block must be stripped
        assert "HTTP/1.1" not in r["html"]


def test_extract_warc_damaged_file_fails_loudly(spark):
    import pandas as pd

    data = build_warc(_records(1))[:-4]
    df = spark.createDataFrame(pd.DataFrame({"warc": [data]}))
    with pytest.raises(Exception):
        extract_warc_responses(df, "warc").collect()


def test_q65_synthesis_decode_roundtrip_fuzz():
    """Derandomized hypothesis round-trip of the q65 wire synthesis
    against the walker's decode chain (the twice-burned class): for
    random html text and every (charset arm x body-layer arm) combo,
    build the bytes EXACTLY the way _q65_build_warc_group does - BOM
    + wire-charset encode with the UnicodeEncodeError utf-8+header
    fallback, arm 4's meta-only declaration, chunked/gzip/deflate
    body layers - then walk them back (dechunk -> content-decode ->
    charset sniff) and require the IDENTICAL string with clean=True.
    Alphabet stresses the known traps: cp1252's 0x80-9F block
    (euro/OE), a cp1252-unencodable C1 (U+0081 -> fallback arm),
    katakana (shift_jis), an astral emoji (utf-16 surrogates +
    fallback on narrow arms), and a LEADING U+FEFF in the text
    itself (the decode strips only the wire BOM, never the text's
    own)."""
    import gzip as _gzip
    import zlib as _zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from e_commerce_data_pipeline_spark.plans.queries import (
        _q65_http_chunked,
        _Q65_BOMS,
        _Q65_CT_HEADERS,
        _Q65_META_PREFIX,
        _Q65_WIRE_CHARSETS,
    )
    from e_commerce_data_pipeline_spark.sources.warc import (
        decode_content_encoding,
        dechunk_http_body,
        decode_http_body,
    )

    alphabet = list("abz <>&;") + [
        "\u00e9",  # e-acute (latin-1 == cp1252)
        "\u20ac",  # euro (cp1252 0x80 - NOT latin-1)
        "\u0152",  # OE ligature (cp1252 0x8C)
        "\u0081",  # C1 control cp1252 cannot encode -> fallback
        "\u2211",  # n-ary sum (utf-8/utf-16 only)
        "\u30a2",  # katakana A (shift_jis)
        "\ufeff",  # the text's OWN zero-width BOM char
        "\U0001f389",  # astral emoji
    ]

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(
        st.text(alphabet=st.sampled_from(alphabet), max_size=24),
        st.integers(min_value=0, max_value=29),
    )
    def run(text, doc_id):
        cs_arm = doc_id % 6
        html = (
            (_Q65_META_PREFIX if cs_arm == 4 else "")
            + "<html><body><p>"
            + text
            + "</p></body></html>"
        )
        # synthesis side - mirror _q65_build_warc_group exactly
        try:
            body = _Q65_BOMS[cs_arm] + html.encode(
                _Q65_WIRE_CHARSETS[cs_arm]
            )
            ct_header = _Q65_CT_HEADERS[cs_arm]
        except UnicodeEncodeError:
            body = html.encode("utf-8")
            ct_header = "text/html; charset=utf-8"
        layer = doc_id % 5
        headers = {"content-type": ct_header}
        if layer in (2, 3):
            body = _gzip.compress(body, compresslevel=1, mtime=0)
            headers["content-encoding"] = "gzip"
        elif layer == 4:
            body = _zlib.compress(body, 1)
            headers["content-encoding"] = "deflate"
        if layer in (1, 3):
            body = _q65_http_chunked(body, doc_id)
            headers["transfer-encoding"] = "chunked"
        # decode side - the walker's outside-in order
        if "transfer-encoding" in headers:
            body = dechunk_http_body(body)
        if "content-encoding" in headers:
            body = decode_content_encoding(
                body, headers["content-encoding"]
            )
        got, charset, clean = decode_http_body(body, headers)
        assert clean is True, (doc_id, charset)
        assert got == html, (doc_id, charset)

    run()

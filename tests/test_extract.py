"""Golden-fixture byte-identity for the HTML→text extractor (no Spark)."""

from data_warehouse_etl_spark.cdc.extract import detect_lang_str, extract_text_bytes

GOLDEN = [
    # plain tags
    (b"<html><body><p>Hello world</p></body></html>", "Hello world"),
    # entities incl. &amp; / &apos; (as in the reference's Bing feed payloads)
    (
        b"<p>Fish &amp; Chips &apos;n more &lt;fresh&gt; caf\xc3\xa9</p>",
        "Fish & Chips 'n more <fresh> café",
    ),
    # <br/> inside text becomes a line break
    (b"line one<br/>line two<br>line three", "line one\nline two\nline three"),
    # script/style/comment stripped entirely
    (
        b"<script>var x = '<p>not text</p>';</script><style>p{}</style>"
        b"<!-- secret --><div>visible</div>",
        "visible",
    ),
    # non-ASCII passthrough (reference Booking feed: Ciudad de Mexico, en-dash)
    (
        "<h1>Ciudad de México</h1><p>1:00pm – 12:00am</p>".encode("utf-8"),
        "Ciudad de México\n1:00pm – 12:00am",
    ),
    # whitespace normalization: runs collapse, 3+ newlines squeeze to 2
    (b"<p>a   b\t c</p>\n\n\n\n<p>d</p>", "a b c\n\nd"),
    # malformed html and invalid utf-8 are total (no raise)
    (b"<div><p>unclosed", "unclosed"),
    (b"\xff\xfe<p>bad bytes</p>", "��bad bytes"),
    # empty and None
    (b"", ""),
    (None, None),
]


def test_extract_text_golden():
    for html, expected in GOLDEN:
        assert extract_text_bytes(html) == expected, html


def test_extract_deterministic_pure():
    blob = b"<html><body><p>The same bytes \xc3\xa9 every time &amp; place</p></body></html>"
    outs = {extract_text_bytes(blob) for _ in range(50)}
    assert len(outs) == 1


def test_detect_lang():
    assert detect_lang_str("the cat sat on the mat and it was happy with this") == "en"
    assert detect_lang_str("der Hund ist nicht mit der Katze und dem Vogel") == "de"
    assert detect_lang_str("le chat est dans la maison et il est pour les oiseaux") == "fr"
    assert detect_lang_str("el perro es un animal que vive en la casa con los gatos") == "es"
    assert detect_lang_str("12345 !!!") == "und"
    assert detect_lang_str(None) is None


def test_generator_templates_roundtrip():
    """Generator HTML extracts to non-empty text and detects its template lang."""
    from data_warehouse_etl_spark.cdc.gen import _html_for, _lang_for

    for u in range(10):
        txt = extract_text_bytes(_html_for(u, 3))
        assert txt and "script" not in txt and "<html" not in txt and "<p>" not in txt
        assert detect_lang_str(txt) == _lang_for(u)


# ---- fast-path equivalence: the optimized extract_text_bytes must match the
# defining regex pipeline byte-for-byte on arbitrary inputs (round 3 swapped
# the hot whitespace steps for C-speed string ops)

from hypothesis import given, settings, strategies as st

from data_warehouse_etl_spark.cdc.extract import (
    _extract_text_bytes_reference,
    extract_text_bytes,
)

_html_soup = st.lists(
    st.one_of(
        st.sampled_from(
            ["<script>", "</script >", "<style>", "</style>", "<!--", "-->",
             "<br/>", "</p>", "<div>", "</div>", "<SCRIPT>", "</SCRIPT>",
             "&amp;", "&eacute;", "&#65;", "&bogus;", "  ", "\t", "\r", "\v",
             "\f", "\n", "\n\n\n", " \n ", "café", "\xa0", "<", ">", "&"]
        ),
        st.text(max_size=8),
    ),
    max_size=24,
).map(lambda parts: "".join(parts).encode("utf-8"))


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), st.binary(max_size=64), _html_soup))
def test_fast_extract_equals_defining_pipeline(data):
    assert extract_text_bytes(data) == _extract_text_bytes_reference(data)

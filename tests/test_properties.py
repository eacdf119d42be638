"""Property-based tests (hypothesis) for the pure-Python halves of
the paired py/Column functions and the patch applier.

These run WITHOUT Spark (fast, thousands of cases): each paired
function already has a Spark-side equivalence test; here the Python
twin — the semantics of record — is hammered with generated inputs.
"""

import difflib

from hypothesis import given, settings
from hypothesis import strategies as st

from ferenda_spark.functions.text import swedish_collation_key
from ferenda_spark.functions.web import canonical_url
from ferenda_spark.operators.patch import apply_patch_text

# -- canonical_url -----------------------------------------------------------

_host = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,10}[A-Za-z0-9])?"
                      r"(\.[A-Za-z]{2,6}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_query = st.lists(st.from_regex(r"[a-z]{1,4}=[A-Za-z0-9]{0,6}",
                                fullmatch=True), max_size=4)
_frag = st.from_regex(r"(#[A-Za-z0-9-]{0,8})?", fullmatch=True)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    q = draw(_query)
    query = ("?" + "&".join(q)) if q else ""
    return f"{scheme}://{host}{port}{draw(_path)}{query}{draw(_frag)}"


@settings(max_examples=300)
@given(_urls())
def test_canonical_url_idempotent(url):
    once = canonical_url(url)
    assert canonical_url(once) == once


@settings(max_examples=300)
@given(_urls())
def test_canonical_url_invariants(url):
    c = canonical_url(url)
    assert "#" not in c                       # fragment stripped
    scheme = c.split("://", 1)[0]
    assert scheme == scheme.lower()           # scheme lowercased
    if scheme == "http":
        assert ":80/" not in c and not c.endswith(":80")
    if "?" in c:
        params = c.split("?", 1)[1].split("&")
        assert params == sorted(params)       # params sorted


# -- patch roundtrip ---------------------------------------------------------

_line = st.from_regex(r"[a-z ]{0,12}", fullmatch=True)
_doc_lines = st.lists(_line, min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(_doc_lines, _doc_lines, st.sampled_from([0, 1, 2]))
def test_patch_roundtrip_difflib(src_lines, dst_lines, context):
    """Any unified diff difflib can produce — including zero-context
    diff -U0 style with pure-insertion '@@ -N,0' hunks — the applier
    must replay: apply(src, diff(src, dst)) == dst, status 'applied'."""
    src = "\n".join(src_lines)
    dst = "\n".join(dst_lines)
    diff = "\n".join(difflib.unified_diff(
        src_lines, dst_lines, lineterm="", n=context))
    if not diff:                      # identical inputs → no patch
        return
    patched, status, _ = apply_patch_text(src, diff)
    assert status == "applied"
    assert patched == dst


@settings(max_examples=200, deadline=None)
@given(_doc_lines, _doc_lines, _doc_lines)
def test_patch_wrong_base_never_corrupts(src_lines, dst_lines, other_lines):
    """Applying a diff to a text it was NOT made from either applies
    cleanly (contexts happened to match) or conflicts and returns the
    input untouched — it must never return a half-applied hybrid."""
    diff = "\n".join(difflib.unified_diff(
        src_lines, dst_lines, lineterm="", n=2))
    if not diff:
        return
    other = "\n".join(other_lines)
    patched, status, _ = apply_patch_text(other, diff)
    if status != "applied":
        assert status == "conflict"
        assert patched == other


# -- Swedish collation -------------------------------------------------------

@settings(max_examples=300)
@given(st.text(alphabet="abzåäöÅÄÖ ABZ", max_size=12),
       st.text(alphabet="abzåäöÅÄÖ ABZ", max_size=12))
def test_swedish_collation_case_insensitive_total_order(a, b):
    ka, kb = swedish_collation_key(a), swedish_collation_key(b)
    assert swedish_collation_key(a.upper()) == ka   # case-insensitive
    assert (ka <= kb) or (kb <= ka)                 # total order
    if a.casefold() == b.casefold():
        assert ka == kb


# -- segment_text ------------------------------------------------------------

# adversarial soup: citation-ish fragments, separators, brackets —
# stitched randomly so class patterns half-match constantly
_cite_frag = st.sampled_from([
    "[RFC 45]", "[RFC", "RFC 0822", "RFCs 1, 2 and 3", "BCP 14",
    "STD", "Articles 5 and 6 of Directive 1995/46/EC", "Article 8",
    "Directive 95/46/EC", "Directive 9/9/E", "Case C-1/01",
    "Items 5 and 6 of Section 4 of Chapter 2 of RFC 7", "of RFC ",
    "Section 2.3 of", "doi:10.1/x.", "ISO 8601:2004",
    "https://x.example/a,b.", "[HTPX]", "] refers to [RFC 3]",
    " and ", ", ", ". ", "word", "\n", "  ", "(", ")",
])
_alias_vals = st.dictionaries(
    st.from_regex(r"[A-Z]{3,8}", fullmatch=True),
    st.from_regex(r"[1-9][0-9]{0,3}", fullmatch=True), max_size=3)


@settings(max_examples=200, deadline=None)
@given(st.lists(_cite_frag, max_size=12), _alias_vals)
def test_segment_text_lossless_and_linkful(frags, aliases):
    """Invariants under adversarial half-matching input: segments
    reassemble to the source EXACTLY (the markup path must never drop
    or duplicate a byte), every link carries a URI, and segmentation
    agrees with the URI extractor's multiset of the same text."""
    from ferenda_spark.operators.mention import segment_text
    text = "".join(frags)
    segs = segment_text(text, aliases)
    assert "".join(s["text"] for s in segs) == text
    for s in segs:
        assert s["kind"] in ("str", "link")
        if s["kind"] == "link":
            assert s["uri"]

"""schema.org JSON-LD extraction: pages → edge-schema triples."""

import pytest

from ferenda_spark.operators.structured_data import (extract_jsonld,
                                                     jsonld_triples)

PAGE = """<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org",
 "@id": "https://a.com/art1",
 "@type": "Article",
 "headline": "One",
 "wordCount": 42,
 "free": true,
 "rating": 4.5,
 "keywords": ["k1", "k2"],
 "author": {"@type": "Person", "name": "Ada"},
 "alternativeHeadline": {"@value": "Ett", "@language": "sv"},
 "datePublished": {"@value": "2024-01-05", "@type": "Date"},
 "missing": null}
</script>
<script type="application/ld+json">not json {</script>
<script type="APPLICATION/LD+JSON">
[{"@type": "Thing", "name": "anon"}]
</script>
<script type="text/javascript">ignored()</script>
</head><body></body></html>"""


def _triples(rows):
    return {(r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
             r["obj_datatype"], r["obj_lang"])
            for r in rows if r["error"] is None}


def test_extract_jsonld_twin():
    rows = extract_jsonld("https://a.com/p1", PAGE)
    errs = [r for r in rows if r["error"]]
    assert len(errs) == 1 and errs[0]["error"].startswith("block 1: json")
    art = "https://a.com/art1"
    got = _triples(rows)
    assert (art, "rdf:type", "schema:Article", False, None, None) in got
    assert (art, "schema:headline", "One", True, None, None) in got
    assert (art, "schema:wordCount", "42", True, "xsd:integer",
            None) in got
    assert (art, "schema:free", "true", True, "xsd:boolean", None) in got
    assert (art, "schema:rating", "4.5", True, "xsd:double", None) in got
    # arrays fan out
    assert (art, "schema:keywords", "k1", True, None, None) in got
    assert (art, "schema:keywords", "k2", True, None, None) in got
    # nested @id-less node: deterministic skolem fragment + own triples
    child = "https://a.com/p1#jsonld/0/author"
    assert (art, "schema:author", child, False, None, None) in got
    assert (child, "rdf:type", "schema:Person", False, None, None) in got
    assert (child, "schema:name", "Ada", True, None, None) in got
    # @value forms: language tag / explicit datatype
    assert (art, "schema:alternativeHeadline", "Ett", True, None,
            "sv") in got
    assert (art, "schema:datePublished", "2024-01-05", True,
            "schema:Date", None) in got
    # third block: single-node top-level array (path collapses to the
    # block ordinal), no @context so terms stay verbatim
    anon = "https://a.com/p1#jsonld/2"
    assert (anon, "rdf:type", "Thing", False, None, None) in got
    assert (anon, "name", "anon", True, None, None) in got
    # JSON null carries no triple
    assert not any(p == "schema:missing" for _, p, *_ in got)


def test_graph_unknown_context_and_keywords():
    # @graph array; unknown context leaves terms verbatim
    html = ('<script type="application/ld+json">'
            '{"@context": "https://example.org/vocab",'
            ' "@graph": [{"@id": "urn:x", "Type_thing": "v"}]}'
            '</script>')
    got = _triples(extract_jsonld("u", html))
    assert got == {("urn:x", "Type_thing", "v", True, None, None)}
    # absolute-IRI and CURIE terms never get prefixed
    html2 = ('<script type="application/ld+json">'
             '{"@context": "https://schema.org", "@id": "urn:y",'
             ' "dcterms:title": "t"}</script>')
    assert ("urn:y", "dcterms:title", "t", True, None, None) in _triples(
        extract_jsonld("u", html2))
    # unhandled @-keyword: loud error row, block dropped whole
    html3 = ('<script type="application/ld+json">'
             '{"@reverse": {"p": {"@id": "urn:z"}}}</script>')
    rows = extract_jsonld("u", html3)
    assert len(rows) == 1 and "@reverse" in rows[0]["error"]
    assert extract_jsonld("u", "<html>no blocks</html>") == []
    assert extract_jsonld("u", None) == []


def test_jsonld_triples_spark(spark):
    pages = spark.createDataFrame(
        [("https://a.com/p1", PAGE.encode("utf-8")),
         ("https://a.com/p2", b"<html></html>")],
        "url string, html binary")
    rows = jsonld_triples(pages).collect()
    twin = extract_jsonld("https://a.com/p1", PAGE)
    assert _triples([r.asDict() for r in rows]) == _triples(twin)
    assert sum(1 for r in rows if r["error"]) == 1


# ---- microdata -------------------------------------------------------------

from ferenda_spark.operators.structured_data import (  # noqa: E402
    extract_microdata,
    microdata_triples,
)

MD_PAGE = """<html><body>
<div itemscope itemtype="https://schema.org/Product"
     itemid="https://x.com/p#prod">
  <span itemprop="name">Widget <b>9000</b></span>
  <meta itemprop="sku" content="SKU-1">
  <a itemprop="url" href="https://x.com/buy/1">buy</a>
  <time itemprop="releaseDate" datetime="2020-01-02">Jan 2</time>
  <data itemprop="gtin" value="123">one two three</data>
  <div itemprop="offers" itemscope itemtype="https://schema.org/Offer">
    <span itemprop="price">42</span>
  </div>
</div>
<div itemscope itemtype="https://schema.org/Person">
  <span itemprop="name givenName">Ada</span>
</div>
</body></html>"""


def test_microdata_kinds_and_nesting():
    got = _triples(extract_microdata("https://x.com/p", MD_PAGE))
    # itemid subject + contracted type
    assert ("https://x.com/p#prod", "rdf:type", "schema:Product",
            False, None, None) in got
    # text value is descendant text, whitespace-normalized
    assert ("https://x.com/p#prod", "schema:name", "Widget 9000",
            True, None, None) in got
    # meta/@content, a/@href resource, time/@datetime, data/@value
    assert ("https://x.com/p#prod", "schema:sku", "SKU-1",
            True, None, None) in got
    assert ("https://x.com/p#prod", "schema:url", "https://x.com/buy/1",
            False, None, None) in got
    assert ("https://x.com/p#prod", "schema:releaseDate", "2020-01-02",
            True, None, None) in got
    assert ("https://x.com/p#prod", "schema:gtin", "123",
            True, None, None) in got
    # @id-less nested item: pre-order skolem ordinal (prod itself is
    # item 0 even though itemid overrides its subject)
    assert ("https://x.com/p#prod", "schema:offers",
            "https://x.com/p#md/1", False, None, None) in got
    assert ("https://x.com/p#md/1", "schema:price", "42",
            True, None, None) in got
    # multi-name itemprop fans out; second top-level item is ordinal 2
    assert ("https://x.com/p#md/2", "schema:name", "Ada",
            True, None, None) in got
    assert ("https://x.com/p#md/2", "schema:givenName", "Ada",
            True, None, None) in got
    assert len(got) == 12


def test_microdata_fail_loud_rows():
    # itemref is out of subset: one error row, page never crashes
    rows = extract_microdata(
        "u", '<div itemscope itemref="a"><span itemprop="x">v</span>'
             "</div>")
    errs = [r for r in rows if r["error"]]
    # the skipped item's orphaned prop errors too — both rows loud
    assert len(errs) == 2 == len(rows)
    assert "itemref" in errs[0]["error"]
    assert "outside any item" in errs[1]["error"]
    # itemprop outside any item: loud, not guessed
    rows = extract_microdata("u", '<span itemprop="name">x</span>')
    assert len(rows) == 1 and "outside any item" in rows[0]["error"]
    # malformed / stray tags: no crash, no phantom triples
    assert extract_microdata("u", "</div></div><p unclosed") == []
    assert extract_microdata("u", None) == []


def test_microdata_vocabless_and_curie_props():
    # no itemtype → names stay verbatim; ':' names never re-prefixed
    rows = extract_microdata(
        "u", '<div itemscope itemid="urn:i">'
             '<span itemprop="plain">a</span>'
             '<span itemprop="dcterms:title">t</span></div>')
    got = _triples(rows)
    assert ("urn:i", "plain", "a", True, None, None) in got
    assert ("urn:i", "dcterms:title", "t", True, None, None) in got


def test_microdata_triples_spark(spark):
    pages = spark.createDataFrame(
        [("https://x.com/p", MD_PAGE.encode("utf-8")),
         ("https://x.com/q", b"<p no items here</p>")],
        "url string, html binary")
    rows = microdata_triples(pages).collect()
    twin = extract_microdata("https://x.com/p", MD_PAGE)
    assert _triples([r.asDict() for r in rows]) == _triples(twin)
    assert sum(1 for r in rows if r["error"]) == 0

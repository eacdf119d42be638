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

"""Tests for the FSM structure parser, citation segmentation, COIN
minting compiler, and the graph-diff P/R harness."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ferenda_spark.functions.minting import UriTemplate, mint
from ferenda_spark.operators.fsm import (
    FSMParser,
    make_rfc_parser,
    paragraphs,
    rfc_text_sections,
)
from ferenda_spark.operators.graph import graph_diff, precision_recall
from ferenda_spark.operators.mention import segment_text

RFC_TEXT = """Network Working Group
Request for Comments: 42

A Test Protocol

1. Introduction

This memo cites [RFC 7] for background.

1.1 Details

See section 2.1 of [RFC 9].

2. Security Considerations

None.
"""


def test_paragraphs_chunking():
    ps = paragraphs("a b\n\n  c\td \n \n e M\x08MU\x08US\x08ST\x08T")
    assert ps == ["a b", "c d", "e MUST"]


def test_fsm_parser_events():
    parser = make_rfc_parser()
    events = parser.parse(paragraphs(RFC_TEXT))
    kinds = [e["kind"] for e in events]
    assert kinds.count("heading") == 3
    assert "header" in kinds
    headings = [e["ordinal"] for e in events if e["kind"] == "heading"]
    assert headings == ["1", "1.1", "2"]


def test_fsm_dynamic_transition():
    # dynamic new_state callable (reference fsmparser.py:154-163)
    p = FSMParser(
        recognizers=[("any", lambda c, peek: True)],
        transitions={("s", "any"): ("mk", lambda chunk: chunk)},
        constructors={"mk": lambda c, s: {"chunk": c, "state": s}},
        initial_state="s")
    out = p.parse(["s", "x"])
    # after first chunk the state becomes "s" (the chunk) again,
    # then "x" — second chunk recognized from state "s" only
    assert [o["state"] for o in out] == ["s", "s"]


def test_rfc_text_sections_df(spark):
    df = spark.createDataFrame(
        [Row(url="u1", text=RFC_TEXT), Row(url="u2", text="")])
    out = {r["url"]: r for r in rfc_text_sections(df).collect()}
    secs = {s["ordinal"]: s for s in out["u1"]["sections"]}
    assert secs["1"]["heading"] == "Introduction"
    assert secs["1.1"]["parent"] == "1"
    assert "[RFC 7]" in secs["1"]["text"]
    assert out["u1"]["header"]["Request for Comments"] == "42"
    assert out["u2"]["sections"] == []


def test_segment_text_golden_shape():
    segs = segment_text(
        "See [RFC 7] and section 2.1 of [RFC 9] or "
        "https://example.com/x. End [FOO] t",
        {"FOO": "12"})
    kinds = [(s["kind"], s["text"]) for s in segs]
    assert ("link", "[RFC 7]") in kinds
    assert ("link", "section 2.1 of [RFC 9]") in kinds
    assert ("link", "https://example.com/x") in kinds
    assert ("link", "[FOO]") in kinds
    uris = {s["text"]: s["uri"] for s in segs if s["kind"] == "link"}
    assert uris["[RFC 7]"].endswith("/res/rfc/7")
    assert uris["section 2.1 of [RFC 9]"].endswith("/res/rfc/9#S2.1")
    assert uris["[FOO]"].endswith("/res/rfc/12")
    # str/link segments reassemble the original text minus nothing
    joined = "".join(s["text"] for s in segs)
    assert joined == ("See [RFC 7] and section 2.1 of [RFC 9] or "
                      "https://example.com/x. End [FOO] t")


def test_segment_unresolvable_alias_stays_text():
    segs = segment_text("Plain [BAR] here", {})
    assert all(s["kind"] == "str" for s in segs)
    assert "".join(s["text"] for s in segs) == "Plain [BAR] here"


def test_minting_cascade(spark):
    templates = [
        UriTemplate(priority=1, uri_template="res/law/{year}:{num}",
                    bindings=["year", "num"]),
        UriTemplate(priority=2, uri_template="res/named/{name}",
                    bindings=["name"], slug=["name"]),
    ]
    df = spark.createDataFrame([
        Row(year="1998", num="204", name=None),
        Row(year=None, num=None, name="Personuppgiftslagen Å"),
        Row(year=None, num=None, name=None),
    ])
    out = [r["uri"] for r in
           mint(df, templates, "https://x.org/").collect()]
    assert out[0] == "https://x.org/res/law/1998:204"
    assert out[1] == "https://x.org/res/named/personuppgiftslagen-aa"
    assert out[2] is None


def test_graph_diff_and_pr(spark):
    cols = "subj string, pred string, obj string"
    got = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "z")], cols)
    want = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("c", "p", "w")], cols)
    key = ["subj", "pred", "obj"]
    both, only_got, only_want = graph_diff(got, want, key)
    assert both.count() == 2
    assert only_got.count() == 1 and only_want.count() == 1
    pr = precision_recall(got, want, key)
    assert abs(pr["precision"] - 2 / 3) < 1e-9
    assert abs(pr["recall"] - 2 / 3) < 1e-9

"""Statute structure parser: golden-tree cases.

Modeled on the reference's golden-XML structure tests
(/root/reference/test/integrationRFC.py:15-21: parse basic.txt,
compare the serialized tree against basic.xml) — here the expected
tree is the flat (node_id, kind, ordinal, parent_id, depth) rows.
"""

from ferenda_spark.operators.structure import StatuteParser, statute_structure
from ferenda_spark.operators.fsm import paragraphs

ACT = """Chapter 1. General Provisions

1 § Scope of this act.

First piece of section 1.

1. first item.

2. second item.

a) nested letter item.

b) another letter.

Second piece of section 1.

2 § Definitions.

First piece of section 2.

Chapter 2. Obligations

3 § Duties.

Piece under continuous numbering.
"""


def _parse(text):
    return [(n["node_id"], n["kind"], n["ordinal"], n["parent_id"],
             n["depth"]) for n in StatuteParser().parse(paragraphs(text))]


def test_golden_tree():
    assert _parse(ACT) == [
        ("K1", "chapter", "1", None, 1),
        ("K1P1", "section", "1", "K1", 2),
        ("K1P1S1", "piece", "1", "K1P1", 3),
        ("K1P1S1N1", "item", "1", "K1P1S1", 4),
        ("K1P1S1N2", "item", "2", "K1P1S1", 4),
        ("K1P1S1N2Ba", "letter", "a", "K1P1S1N2", 5),
        ("K1P1S1N2Bb", "letter", "b", "K1P1S1N2", 5),
        ("K1P1S2", "piece", "2", "K1P1", 3),
        ("K1P2", "section", "2", "K1", 2),
        ("K1P2S1", "piece", "1", "K1P2", 3),
        ("K2", "chapter", "2", None, 1),
        # section numbering continues across chapters (the
        # sfs_parser paragrafnummer invariant)
        ("K2P3", "section", "3", "K2", 2),
        ("K2P3S1", "piece", "1", "K2P3", 3),
    ]


def test_item_without_piece_is_skipped():
    # a numbered line before any section/piece context is prose noise
    assert _parse("1. stray numbered line.\n\n2 § Real section.") == [
        ("K0P2", "section", "2", None, 2)]


def test_letter_without_item_is_skipped():
    out = _parse("Chapter 1. T\n\n1 § S.\n\nPiece.\n\na) stray letter.")
    kinds = [k for _, k, _, _, _ in out]
    assert "letter" not in kinds  # no open item → treated as nothing


def test_plain_paragraph_closes_item_list():
    out = _parse("Chapter 1. T\n\n1 § S.\n\nP1.\n\n1. item.\n\nP2.\n\n"
                 "1. item again.")
    ids = [i for i, *_ in out]
    assert "K1P1S1N1" in ids and "K1P1S2N1" in ids


def test_spark_integration(spark):
    df = spark.createDataFrame([("u1", ACT), ("u2", "")],
                               "url string, text string")
    rows = statute_structure(df).collect()
    assert {r["url"] for r in rows} == {"u1"}
    assert len(rows) == 13
    depths = {r["depth"] for r in rows}
    assert depths == {1, 2, 3, 4, 5}

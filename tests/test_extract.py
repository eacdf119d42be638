"""Extract stage: byte-identical text per url (the BASELINE invariant)."""

from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import gen_doc, pages_df, render_html, render_text
from ferenda_spark.operators.extract import extract, parse_page

N_DOCS = 120


def test_text_byte_identical_local():
    for n in range(1, 61):
        doc = gen_doc(n, 60)
        assert parse_page(render_html(doc))["text"] == render_text(doc)


def test_text_md5_parity_distributed(spark):
    pages = pages_df(spark, N_DOCS, partitions=4)
    ext = extract(pages)
    joined = (
        ext.select("url", F.md5(F.encode("text", "utf-8")).alias("got"))
        .join(pages.select(
            "url", F.md5(F.encode("text", "utf-8")).alias("want")), "url")
    )
    assert joined.count() == N_DOCS
    assert joined.filter(F.col("got") != F.col("want")).count() == 0


def test_extract_structure(spark):
    doc = gen_doc(3, 100)
    parsed = parse_page(render_html(doc))
    assert parsed["title"] == doc["title"]
    assert parsed["header"]["Request for Comments"] == "3"
    got_ords = [s["ordinal"] for s in parsed["sections"]]
    assert got_ords == [s["ordinal"] for s in doc["sections"]]
    # headings round-trip through noise + normalization
    assert [s["heading"] for s in parsed["sections"]] == \
        [s["heading"] for s in doc["sections"]]


def test_non_document_pages_flagged(spark):
    pages = pages_df(spark, N_DOCS, partitions=2)
    ext = extract(pages)
    n_nondoc = ext.filter(~F.col("is_doc")).count()
    assert 0 < n_nondoc < N_DOCS / 4
    # non-docs still honor the text invariant
    bad = (extract(pages).select("url", "text")
           .join(pages.select("url", F.col("text").alias("want")), "url")
           .filter(F.col("text") != F.col("want")))
    assert bad.count() == 0


def test_generator_partition_invariance(spark):
    a = pages_df(spark, 50, partitions=1).select("url", F.md5("html").alias("h"))
    b = pages_df(spark, 50, partitions=7).select("url", F.md5("html").alias("h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_parser_malformed_realweb_shapes():
    """Parser robustness on shapes the synthetic fixture never emits
    but the open web does — each was a real bug:"""
    # 1. an end tag inside a DROP_TAGS subtree must not pop the
    #    section stack (HTMLParser streams children of center/font)
    p = parse_page(
        b'<html><body><div about="#S1"><p>1. Sec</p>'
        b'<center><div><p>ad</p></div></center>'
        b'<p>More text.</p></div></body></html>')
    assert p["sections"][0]["text"].endswith("More text.")
    assert "ad" not in p["text"]
    # 2. a nested plain div inside the header div must not clear
    #    header classification for the following lines
    p = parse_page(
        b'<html><body><div class="header"><div><p>Pub X</p></div>'
        b'<p>Obsoletes: 99</p></div><p>T</p></body></html>')
    assert p["header"].get("Obsoletes") == "99"
    assert p["title"] == "T"
    # 3. nested blocks (li > p) keep every chunk, in reading order
    p = parse_page(b"<html><body><ul><li>intro text <p>body</p>"
                   b" trailing</li></ul></body></html>")
    assert p["text"] == "intro text body trailing"
    # 4. the <body> tag is optional: content still extracts
    p = parse_page(b"<html><p>Request for Comments: 9</p>"
                   b"<p>visible</p></html>")
    assert "visible" in p["text"]
    # 5. <head> content (title tag etc.) never leaks into text
    p = parse_page(b"<html><head><title>head noise</title></head>"
                   b"<body><p>real</p></body></html>")
    assert p["text"] == "real"

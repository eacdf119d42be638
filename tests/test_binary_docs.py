"""Binary document ingest (S5/S6 plumbing): binaryFile scan,
magic-byte sniffing, per-format routing, declared decode stub."""

import pytest

from ferenda_spark.sources.binary_docs import (
    decode_binary_docs,
    read_binary_docs,
    route_by_type,
)


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    (d / "a.pdf").write_bytes(b"%PDF-1.7 fake body")
    (d / "b.doc").write_bytes(b"\xd0\xcf\x11\xe0 ole2 body")
    (d / "c.docx").write_bytes(b"PK\x03\x04 zip body")
    (d / "archive.zip").write_bytes(b"PK\x03\x04 zip body")
    (d / "page.html").write_bytes(b"<html><body>x</body></html>")
    (d / "modern.html").write_bytes(b"<!doctype html><title>t</title>")
    (d / "shouty.html").write_bytes(b"<HTML><BODY>x</BODY></HTML>")
    (d / "lies.pdf").write_bytes(b"<html>not actually a pdf</html>")
    (d / "mystery.bin").write_bytes(b"\x00\x01\x02\x03")
    return str(d)


def test_sniff_and_route(spark, bin_dir):
    docs = read_binary_docs(spark, bin_dir)
    by_name = {r["url"].rsplit("/", 1)[-1]: r["media_type"]
               for r in docs.collect()}
    assert by_name["a.pdf"] == "application/pdf"
    assert by_name["b.doc"] == "application/msword"
    assert by_name["c.docx"].endswith("wordprocessingml.document")
    assert by_name["archive.zip"] == "application/zip"
    assert by_name["page.html"] == "text/html"
    assert by_name["modern.html"] == "text/html"   # lowercase doctype
    assert by_name["shouty.html"] == "text/html"
    assert by_name["lies.pdf"] == "text/html"   # magic beats extension
    assert by_name["mystery.bin"] == "application/octet-stream"

    routed = route_by_type(docs)
    names = {k: {r["url"].rsplit("/", 1)[-1] for r in v.collect()}
             for k, v in routed.items()}
    assert names["pdf"] == {"a.pdf"}
    assert names["word"] == {"b.doc", "c.docx"}
    assert names["html"] == {"page.html", "lies.pdf", "modern.html",
                             "shouty.html"}
    assert names["other"] == {"archive.zip", "mystery.bin"}
    # routing is a partition: nothing lost, nothing duplicated
    assert sum(len(v) for v in names.values()) == 9


def test_glob_filter(spark, bin_dir):
    only_pdf = read_binary_docs(spark, bin_dir, glob="*.pdf")
    assert {r["url"].rsplit("/", 1)[-1] for r in only_pdf.collect()} == {
        "a.pdf", "lies.pdf"}


def test_decode_stub_declared(spark, bin_dir):
    with pytest.raises(NotImplementedError):
        decode_binary_docs(read_binary_docs(spark, bin_dir))

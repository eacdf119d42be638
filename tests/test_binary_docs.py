"""Binary document ingest (S5/S6): binaryFile scan, magic-byte
sniffing, per-format routing, and the REAL stdlib decoders — docx
(zip+XML) and the declared PDF subset (plain/FlateDecode content
streams) — with per-row error capture for the loud stubs."""

import io
import zipfile
import zlib

import pytest

from ferenda_spark.sources.binary_docs import (
    decode_binary_docs,
    docx_text,
    pdf_text,
    read_binary_docs,
    route_by_type,
)


def _mk_docx(paras: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paras)
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        + body + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _mk_pdf(plain: bytes, flate: bytes | None = None) -> bytes:
    def obj(n, body):
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    pdf = b"%PDF-1.4\n"
    pdf += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    pdf += obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    pdf += obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    pdf += obj(4, b"<< /Length %d >>\nstream\n" % len(plain)
               + plain + b"\nendstream")
    if flate is not None:
        z = zlib.compress(flate)
        pdf += obj(5, b"<< /Length %d /Filter /FlateDecode >>\n"
                   b"stream\n" % len(z) + z + b"\nendstream")
    return pdf + b"%%EOF\n"


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    (d / "a.pdf").write_bytes(_mk_pdf(
        b"BT (Hello PDF) Tj T* (line two \\(esc\\)) Tj ET",
        b"BT [(TJ ar) -250 (ray bits)] TJ ET BT <48657821> Tj ET"))
    (d / "b.doc").write_bytes(b"\xd0\xcf\x11\xe0 ole2 body")
    (d / "c.docx").write_bytes(_mk_docx(
        ["Hello docx", "Second para cites [RFC 45]."]))
    (d / "archive.zip").write_bytes(b"PK\x03\x04 zip body")
    (d / "page.html").write_bytes(b"<html><body>x</body></html>")
    (d / "modern.html").write_bytes(b"<!doctype html><title>t</title>")
    (d / "shouty.html").write_bytes(b"<HTML><BODY>x</BODY></HTML>")
    (d / "lies.pdf").write_bytes(b"<html>not actually a pdf</html>")
    (d / "mystery.bin").write_bytes(b"\x00\x01\x02\x03")
    (d / "evil.pdf").write_bytes(b"%PDF-1.4 truncated garbage")
    (d / "crypt.pdf").write_bytes(_mk_pdf(b"BT (x) Tj ET")
                                  + b"/Encrypt 9 0 R")
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
    assert names["pdf"] == {"a.pdf", "evil.pdf", "crypt.pdf"}
    assert names["word"] == {"b.doc", "c.docx"}
    assert names["html"] == {"page.html", "lies.pdf", "modern.html",
                             "shouty.html"}
    assert names["other"] == {"archive.zip", "mystery.bin"}
    # routing is a partition: nothing lost, nothing duplicated
    assert sum(len(v) for v in names.values()) == 11


def test_glob_filter(spark, bin_dir):
    only_pdf = read_binary_docs(spark, bin_dir, glob="*.pdf")
    assert {r["url"].rsplit("/", 1)[-1] for r in only_pdf.collect()} == {
        "a.pdf", "lies.pdf", "evil.pdf", "crypt.pdf"}


# -- pure codecs --------------------------------------------------------------

def test_docx_text_paragraphs_tabs_breaks():
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>Hello docx</w:t></w:r>"
        "<w:r><w:tab/><w:t>col2</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t></w:r></w:p>"
        "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    assert docx_text(buf.getvalue()) == "Hello docx\tcol2\na\nb"


def test_pdf_text_operators_escapes_hex_flate():
    pdf = _mk_pdf(
        b"BT (Hello PDF) Tj T* (line two \\(esc\\) \\110i) Tj ET",
        b"BT [(TJ ar) -250 (ray bits)] TJ ET BT <48657821> Tj ET")
    assert pdf_text(pdf) == (
        "Hello PDF\nline two (esc) Hi\nTJ array bits\nHex!")


def test_pdf_subset_limits_are_loud():
    with pytest.raises(ValueError, match="Encrypt"):
        pdf_text(_mk_pdf(b"BT (x) Tj ET") + b"/Encrypt 9 0 R")
    with pytest.raises(ValueError, match="Type0"):
        pdf_text(_mk_pdf(b"BT (x) Tj ET") + b"/Type0 9 0 R")


def _mk_cmap_pdf(content_stream: bytes, cmap_body: bytes,
                 flate_cmap: bool = False) -> bytes:
    """A one-page PDF whose /F1 font carries a ToUnicode CMap."""
    import zlib

    def obj(n, body):
        return b"%d 0 obj\n%s\nendobj\n" % (n, body)

    cm = (b"/CIDInit /ProcSet findresource begin\n"
          b"begincmap\n" + cmap_body + b"\nendcmap\nend\n")
    if flate_cmap:
        cm = zlib.compress(cm)
        cm_hdr = b"<< /Length %d /Filter /FlateDecode >>" % len(cm)
    else:
        cm_hdr = b"<< /Length %d >>" % len(cm)
    pdf = b"%PDF-1.4\n"
    pdf += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    pdf += obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    pdf += obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                  b"/Resources << /Font << /F1 5 0 R /F2 7 0 R >> "
                  b">> >>")
    pdf += obj(4, b"<< /Length %d >>\nstream\n" % len(content_stream)
                  + content_stream + b"\nendstream")
    pdf += obj(5, b"<< /Type /Font /Subtype /TrueType "
                  b"/BaseFont /Mapped /ToUnicode 6 0 R >>")
    pdf += obj(6, cm_hdr + b"\nstream\n" + cm + b"\nendstream")
    pdf += obj(7, b"<< /Type /Font /Subtype /TrueType "
                  b"/BaseFont /Plain >>")
    return pdf + b"%%EOF\n"


_CMAP = (b"2 beginbfchar\n<01> <0048>\n<03> <00660066 0069>\n"
         b"endbfchar\n"
         b"2 beginbfrange\n<20> <7E> <0020>\n"
         b"<04> <06> [<0058> <0059> <005A>]\nendbfrange\n")


def test_pdf_tounicode_simple_font():
    """Round-5 CMap subset: bfchar (incl. multi-unit ligature dst),
    scalar bfrange (base increments), array bfrange, Tf font
    switching (mapped → unmapped falls back to latin-1), and a
    FlateDecode'd CMap stream."""
    # codes: 01=H, ASCII range identity, 03=ffi ligature, 04..06=XYZ
    body = b"BT /F1 12 Tf (\x01i \x03 \x04\x05\x06 ok) Tj ET"
    assert pdf_text(_mk_cmap_pdf(body, _CMAP)) == "Hi ffi XYZ ok"
    # Flate-compressed CMap stream decodes identically
    assert pdf_text(_mk_cmap_pdf(body, _CMAP, flate_cmap=True)) \
        == "Hi ffi XYZ ok"
    # font switch: /F2 has no ToUnicode -> latin-1 passthrough
    body2 = (b"BT /F1 12 Tf (\x01i) Tj T* /F2 12 Tf (plain) Tj ET")
    assert pdf_text(_mk_cmap_pdf(body2, _CMAP)) == "Hi\nplain"
    # hex strings decode through the active map too
    body3 = b"BT /F1 12 Tf <012003> Tj ET"
    assert pdf_text(_mk_cmap_pdf(body3, _CMAP)) == "H ffi"


def test_pdf_tounicode_loud_contract():
    # unmapped code under an active ToUnicode: loud, never guessed
    with pytest.raises(ValueError, match="not in the active font"):
        pdf_text(_mk_cmap_pdf(b"BT /F1 12 Tf (\x02) Tj ET", _CMAP))
    # multi-byte source code = composite font territory
    with pytest.raises(ValueError, match="multi-byte CMap code"):
        pdf_text(_mk_cmap_pdf(
            b"BT /F1 12 Tf (x) Tj ET",
            b"1 beginbfchar\n<0001> <0048>\nendbfchar\n"))
    # bfrange destination array length mismatch
    with pytest.raises(ValueError, match="length mismatch"):
        pdf_text(_mk_cmap_pdf(
            b"BT /F1 12 Tf (x) Tj ET",
            b"1 beginbfrange\n<01> <03> [<0058>]\nendbfrange\n"))
    # dangling ToUnicode reference on a declared font
    bad = _mk_cmap_pdf(b"BT (x) Tj ET", _CMAP).replace(
        b"/ToUnicode 6 0 R", b"/ToUnicode 9 0 R")
    with pytest.raises(ValueError, match="dangling ToUnicode"):
        pdf_text(bad)


# -- distributed decode --------------------------------------------------------

def test_decode_binary_docs_end_to_end(spark, bin_dir):
    out = {r["url"].rsplit("/", 1)[-1]: r for r in
           decode_binary_docs(read_binary_docs(spark, bin_dir))
           .collect()}
    assert out["a.pdf"]["text"] == (
        "Hello PDF\nline two (esc)\nTJ array bits\nHex!")
    assert out["a.pdf"]["error"] is None
    assert out["c.docx"]["text"] == (
        "Hello docx\nSecond para cites [RFC 45].")
    assert "x" in out["page.html"]["text"]
    # loud stubs / poison rows: error set, text null, job alive
    assert out["b.doc"]["text"] is None and "antiword" in out["b.doc"]["error"]
    assert out["crypt.pdf"]["text"] is None
    assert "Encrypt" in out["crypt.pdf"]["error"]
    assert out["mystery.bin"]["text"] is None
    assert all(r["n_chars"] == (len(r["text"]) if r["text"] else 0)
               for r in out.values())


def test_pdf_td_lines_and_decodeparms_loud():
    # Td between text runs starts a new line (the pdftotext-common
    # layout pattern) — previously the words concatenated silently
    pdf = _mk_pdf(b"BT 72 700 Td (Hello) Tj 0 -14 Td (World) Tj ET")
    assert pdf_text(pdf) == "Hello\nWorld"
    # a predictor-coded text content stream is LOUD, not garbled
    import zlib as _z
    cs = _z.compress(b"BT (x) Tj ET")
    body = (b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(cs)).encode()
            + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 4 >> >>\nstream\n"
            + cs + b"\nendstream\nendobj\n%%EOF\n")
    with pytest.raises(ValueError, match="DecodeParms"):
        pdf_text(body)
    # nested dict before the filter no longer hides FlateDecode
    cs2 = _z.compress(b"BT (ok) Tj ET")
    body2 = (b"%PDF-1.4\n4 0 obj\n<< /Resources << /Font << /F1 5 0 R "
             b">> >> /Length " + str(len(cs2)).encode()
             + b" /Filter /FlateDecode >>\nstream\n"
             + cs2 + b"\nendstream\nendobj\n%%EOF\n")
    assert pdf_text(body2) == "ok"

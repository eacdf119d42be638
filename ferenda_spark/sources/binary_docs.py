"""Binary document readers (S5 PDF / S6 Word): source plumbing.

The reference reads downloaded PDF/Word files per-basefile through
external converters (/root/reference/ferenda/pdfreader.py:107-150
``pdftohtml``/``pdftotext`` subprocesses; ``wordreader.py:36-72``
antiword / MS Word COM).  The Spark restatement ingests a whole
directory tree of binaries in one scan with the built-in
``binaryFile`` source, sniffs the real media type from magic bytes
JVM-side (never trusting file extensions — crawls lie), and routes
each format to its decoder.

The decoders themselves are declared codec stubs, same policy as
operators/multimodal.py and operators/boxes.py (the container ships
no pdftohtml/antiword); everything around them — the distributed
scan, the sniffing, the routing, the per-format fan-out — is real
and tested.  A production deployment replaces ``decode_binary_docs``
with a mapInPandas invoking the codec per Arrow batch, exactly the
extract.py pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: magic-byte prefixes → media type (checked in order; OLE2 covers
#: legacy .doc, ZIP covers OOXML .docx — refined by extension only as
#: a ZIP-subtype tiebreak, since OOXML vs plain ZIP needs the inner
#: [Content_Types].xml at decode time). ``ci`` marks text magics
#: matched case-insensitively — '<!doctype html>' (the HTML5 form)
#: and '<HTML>' are as common as the uppercase variants; binary
#: magics stay byte-exact.
_MAGIC = [
    ("%PDF", "application/pdf", False),
    ("\xd0\xcf\x11\xe0", "application/msword", False),
    ("PK\x03\x04", "application/zip", False),
    ("<!DO", "text/html", True),
    ("<htm", "text/html", True),
]


def read_binary_docs(spark: SparkSession, path: str,
                     glob: str = "*") -> DataFrame:
    """Directory of document binaries → (url, content, length,
    mod_ts, media_type). One distributed scan; no driver listing."""
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", glob)
          .option("recursiveFileLookup", "true")
          .load(path))
    return df.select(
        F.col("path").alias("url"),
        F.col("content"),
        F.col("length"),
        F.col("modificationTime").alias("mod_ts"),
        sniff_media_type(F.col("content"), F.col("path"))
        .alias("media_type"))


def sniff_media_type(content, path) -> F.Column:
    """Magic-byte media-type sniff on the first bytes of ``content``
    (binary column), with extension tiebreak for ZIP containers."""
    head = F.decode(F.substring(content, 1, 4), "ISO-8859-1")
    out = F.lit("application/octet-stream")
    for prefix, mtype, ci in reversed(_MAGIC):
        probe = F.substring(head, 1, len(prefix))
        if ci:
            hit = F.upper(probe) == F.lit(prefix.upper())
        else:
            hit = probe == F.lit(prefix)
        if mtype == "application/zip":
            mt = (F.when(F.lower(path).endswith(".docx"),
                         F.lit("application/vnd.openxmlformats-"
                               "officedocument.wordprocessingml.document"))
                  .otherwise(F.lit(mtype)))
        else:
            mt = F.lit(mtype)
        out = F.when(hit, mt).otherwise(out)
    return out


def route_by_type(docs: DataFrame) -> dict[str, DataFrame]:
    """Split an ingested binary table into per-decoder streams."""
    return {
        "pdf": docs.filter(F.col("media_type") == "application/pdf"),
        "word": docs.filter(
            F.col("media_type").isin(
                "application/msword",
                "application/vnd.openxmlformats-officedocument."
                "wordprocessingml.document")),
        "html": docs.filter(F.col("media_type") == "text/html"),
        "other": docs.filter(~F.col("media_type").isin(
            "application/pdf", "application/msword",
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.document", "text/html")),
    }


def decode_binary_docs(docs: DataFrame):
    """Binary → text/boxes. Honest stub (no PDF/Word codecs in this
    runtime); production swaps in a mapInPandas over the routed
    streams (pdf → operators/boxes.py box rows, word → text)."""
    raise NotImplementedError(
        "PDF/Word decoding requires external codecs; see "
        "read_binary_docs/route_by_type for the ingest contract")

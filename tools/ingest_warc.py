"""spark-submit WARC → knowledge-graph ingest — the production entry
point of the whole pipeline: a directory of crawl segments in, a
committed GraphStore out.

Usage:
    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/ingest_warc.py <warc_dir> <store_dir> \
        [--doc-url-regex RE] [--lang LANG]

Stages (each an independently gated operator):
  1. ``read_warc``            — distributed segment scan, per-record
                                error capture (corrupt segments
                                surface as ERROR_ROWS, never job
                                kills)
  2. ``pages_from_warc``      — HTTP-200 responses → (url, warc_ts,
                                html)
  3. ``latest_fetch``         — multi-snapshot dedup: newest fetch
                                per canonical url
  4. lang recovery            — html lang attribute, scan-side
                                (override with --lang)
  5. ``run_pipeline``         — extract → mention → link → mint →
                                snapshot-committed edge/node/
                                provenance tables; re-running on the
                                same archive is a no-op (resume
                                contract), a changed page retires its
                                previous subgraph in read_current

Prints one INGEST_STATS line (grep ^INGEST_STATS) with page, triple
and error-row counts; exits nonzero on zero parsed pages (an archive
of only poison segments is an operational fault, not a success).
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, argv: list[str]) -> dict:
    from ferenda_spark.fixtures.pages import entities_df
    from ferenda_spark.operators.graph import GraphStore
    from ferenda_spark.operators.webfilter import latest_fetch
    from ferenda_spark.pipeline import run_pipeline
    from ferenda_spark.sources.testdata import DOC_PAGE_URL_RE
    from ferenda_spark.sources.warc import (html_lang_col,
                                            pages_from_warc, read_warc)

    warc_dir, store_dir = argv[0], argv[1]
    rest = argv[2:]
    doc_url_re = DOC_PAGE_URL_RE
    lang = None
    if "--doc-url-regex" in rest:
        i = rest.index("--doc-url-regex")
        doc_url_re = rest[i + 1]
    if "--lang" in rest:
        i = rest.index("--lang")
        lang = rest[i + 1]

    # two passes over the archive (error census, then the pages
    # build) instead of persisting the raw records — caching every
    # decompressed body of a crawl just to share an error count would
    # spill the whole corpus
    records = read_warc(spark, warc_dir)
    n_errors = records.filter(F.col("error").isNotNull()).count()
    fetched = latest_fetch(pages_from_warc(records))
    pages = fetched.select(
        F.col("canonical_url").alias("url"), "warc_ts", "html")
    pages = pages.withColumn(
        "lang", F.lit(lang) if lang is not None
        else html_lang_col(F.col("html")))
    # the narrow post-dedup projection IS worth caching: the count
    # below and run_pipeline's pending anti-join both consume it
    pages = pages.persist()
    n_pages = pages.count()

    store = GraphStore(spark, store_dir)
    # the extraction configuration is part of the resume identity: a
    # rerun with a corrected regex/lang reprocesses everything and
    # retires the old subgraph, instead of silently no-op'ing
    stats = run_pipeline(spark, pages, entities_df(spark), store,
                         doc_url_regex=doc_url_re,
                         config_salt="%s|%s" % (doc_url_re, lang or ""))
    pages.unpersist()
    # stats carries "pages" = pipeline-processed pages (0 on a resumed
    # no-op run); parsed_pages = what the archive yielded this run
    out = {"warc_error_rows": n_errors, "parsed_pages": n_pages, **stats}
    print("INGEST_STATS " + " ".join(f"{k}={v}" for k, v in out.items()))
    if n_pages == 0:
        raise SystemExit("ingest_warc: zero pages parsed from %s"
                         % warc_dir)
    return out


if __name__ == "__main__":
    spark = SparkSession.builder.getOrCreate()
    run(spark, sys.argv[1:])

"""Sources over the driver's parquet testdata + the pages derivation.

``load_table`` is the plain scan path (parquet today, Iceberg
``spark.read.table`` in production — same DataFrame downstream).

``pages_from_documents`` turns the ``documents`` table into the
BASELINE input shape ``(url, warc_ts, html, text, lang)`` with **pure
Column expressions** (no Python, no randomness): every header field,
section, and embedded citation is a deterministic function of
``doc_id``, so an ANSI-SQL oracle can reconstruct the expected
extracted text and the expected triple set independently. This makes
the *whole* KG pipeline (extract → mention → link → mint) checkable
against DuckDB, not just its relational fragments.

The page shape mirrors the synthetic corpus in fixtures/pages.py
(RFC-like header block + sections, modeled on the reference's RFC repo
/root/reference/ferenda/sources/tech/rfc.py:550-644 header extraction
and elements_from_soup semantics /root/reference/ferenda/elements/
html.py:23-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import (
    BASE,
    CATEGORIES,
    MONTHS,
    PUBLISHERS,
)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Pages derived from `documents` mint under /res/doc/ (the fixture
# corpus uses /res/rfc/) — the discovery regex is a parameter of the
# extract stage either way.
DOC_PAGE_URL_RE = r"^https://example\.org/res/doc/\d+$"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver testdata table. Iceberg equivalent:
    ``spark.read.table(f"testdata.{name}")``."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _elem(values: list[str], idx_col, alias: str):
    """values[idx_col] as a Column (idx 0-based) via element_at."""
    return F.element_at(F.array(*[F.lit(v) for v in values]),
                        idx_col.cast("int") + 1).alias(alias)


def doc_features(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) → per-doc derived fields.

    Everything is arithmetic on doc_id (reconstructible in ANSI SQL):
      publisher   = PUBLISHERS[doc_id % 5]          (canonical label)
      category    = CATEGORIES[doc_id % 5]
      month/year  = MONTHS[doc_id % 12], 1990 + doc_id % 30
      updates     = [doc_id % 97 + 1]               iff doc_id % 3 == 0
      cite_a      = doc_id % 7 + 1     (hot head)   iff doc_id % 10 < 6
                    else doc_id * 7 % 499 + 1       (cold tail)
      cite_b      = doc_id * 13 % 499 + 1, section s = (d%5+1).(d%3+1)
      alias_target= doc_id % 250 + 1                iff doc_id % 4 == 0

    The cite_a split gives the zipf-ish head-entity skew of the north
    star: 60% of all citations target just 7 URIs.
    """
    d = F.col("doc_id").cast("long")
    return documents.select(
        "doc_id", "lang",
        F.concat(F.lit(BASE + "res/doc/"), d.cast("string")).alias("url"),
        F.concat(F.lit("Document "), d.cast("string")).alias("title"),
        _elem([p[0] for p in PUBLISHERS], d % 5, "publisher"),
        _elem(CATEGORIES, d % 5, "category"),
        _elem(MONTHS, d % 12, "month"),
        (F.lit(1990) + d % 30).cast("string").alias("year"),
        F.lpad((d % 12 + 1).cast("string"), 2, "0").alias("month_num"),
        F.when(d % 3 == 0, (d % 97 + 1).cast("string")).alias("updates"),
        F.when(d % 10 < 6, d % 7 + 1)
         .otherwise(d * 7 % 499 + 1).cast("string").alias("cite_a"),
        (d * 13 % 499 + 1).cast("string").alias("cite_b"),
        F.concat((d % 5 + 1).cast("string"), F.lit("."),
                 (d % 3 + 1).cast("string")).alias("cite_sec"),
        F.when(d % 4 == 0, (d % 250 + 1).cast("string")).alias("alias_target"),
        # multi-class citation features (grammar/citations.py classes);
        # presence gated on distinct moduli so classes mix freely
        F.when(d % 6 == 0, (d % 79 + 1).cast("string")).alias("bcp_num"),
        F.when(d % 7 == 1, (d % 50 + 1).cast("string")).alias("std_num"),
        F.when(d % 5 == 1, F.concat(
            F.lit("draft-ietf-wg"), (d % 20).cast("string"),
            F.lit("-proto-"),
            F.lpad((d % 9).cast("string"), 2, "0"))).alias("draft_slug"),
        F.when(d % 8 == 2,
               F.concat(F.lit("10.1000/jproto."), d.cast("string"))
               ).alias("doi_id"),
        F.when(d % 9 == 3, (8000 + d % 600).cast("string")).alias("iso_num"),
        F.when(d % 9 == 3, (1996 + d % 25).cast("string")).alias("iso_year"),
        # two-digit years 40..99 exercise both pivot branches (>=50 →
        # 19xx, <50 → 20xx) of the year normalizer
        F.when(d % 10 == 4,
               (d % 60 + 40).cast("string")).alias("eu_year2"),
        F.when(d % 10 == 4, (d % 200 + 1).cast("string")).alias("eu_num"),
        F.when(d % 11 == 5, (d % 400 + 1).cast("string")).alias("case_num"),
        F.when(d % 11 == 5,
               F.lpad((d % 20).cast("string"), 2, "0")).alias("case_year2"),
        # zero-padded list items (RFC 0822 style) exercise
        # strip_leading_zeros on the mint path
        F.when(d % 12 == 6,
               F.lpad((d % 90 + 1).cast("string"), 4, "0")).alias("list_a"),
        F.when(d % 12 == 6,
               F.lpad((d % 90 + 101).cast("string"), 4, "0")).alias("list_b"),
        F.when(d % 12 == 6,
               F.lpad((d % 90 + 201).cast("string"), 4, "0")).alias("list_c"),
        F.when(d % 13 == 7, F.concat(
            (d % 6 + 1).cast("string"), F.lit("."),
            (d % 2 + 1).cast("string"))).alias("that_sec"),
        # distributed-list class (eu_article): two article ordinals
        # sharing one directive context; 4-digit year by construction
        # so the flat eu_directive class cannot co-match
        F.when(d % 15 == 9, (d % 9 + 1).cast("string")).alias("art_a1"),
        F.when(d % 15 == 9,
               (d % 9 + 2 + d % 3).cast("string")).alias("art_a2"),
        F.when(d % 15 == 9,
               (1984 + d % 40).cast("string")).alias("art_year4"),
        F.when(d % 15 == 9, (d % 120 + 1).cast("string")).alias("art_num"),
        # recursive structure chain (nested_struct class): item list
        # distributed over a section+chapter context of a target doc
        F.when(d % 14 == 10, (d % 5 + 1).cast("string")).alias("ns_i1"),
        F.when(d % 14 == 10,
               (d % 5 + 2 + d % 2).cast("string")).alias("ns_i2"),
        F.when(d % 14 == 10, (d % 8 + 1).cast("string")).alias("ns_sec"),
        F.when(d % 14 == 10, (d % 4 + 1).cast("string")).alias("ns_chap"),
        F.when(d % 14 == 10, (d % 300 + 1).cast("string")).alias("ns_doc"),
        # bare external URL (trailing-punctuation exclusion class)
        F.when(d % 3 == 2, F.concat(
            F.lit("https://www.example.com/spec/"),
            d.cast("string"))).alias("ext_url"),
        # body text, normalized exactly like the extract stage will
        # (normalize_space semantics, reference util.py:287-296)
        F.trim(F.regexp_replace(F.translate(F.col("text"), "\xa0", " "),
                                r"[ \t\n\r\f\x0B]+", " ")).alias("body"),
    )


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """documents → pages(url, warc_ts, html, text, lang), pure columns.

    Layout (identical in spirit to fixtures.render_html): header div
    with publisher / RFC-number / category / updates / date lines, h1
    title, <script> noise the extractor must drop, section S1 carrying
    the document body (plus an alias-definition sentence for every 4th
    doc), section S1.1 carrying citation sentences.
    """
    f = doc_features(documents)
    c = F.concat

    alias_def = F.when(
        F.col("alias_target").isNotNull(),
        c(F.lit("In this document, [DGRAM] refers to [RFC "),
          F.col("alias_target"), F.lit("]. "))).otherwise(F.lit(""))
    alias_use = F.when(
        F.col("alias_target").isNotNull(),
        F.lit(" As defined in [DGRAM] above.")).otherwise(F.lit(""))

    sec1_text = c(alias_def, F.col("body"))
    sec11_text = c(F.lit("See [RFC "), F.col("cite_a"),
                   F.lit("] and section "), F.col("cite_sec"),
                   F.lit(" of [RFC "), F.col("cite_b"), F.lit("]."),
                   alias_use)

    def opt(col_name: str, *pieces) -> "F.Column":
        return F.when(F.col(col_name).isNotNull(),
                      c(*pieces)).otherwise(F.lit(""))

    # S2 "References": one optional sentence per citation class, in a
    # fixed order (the stateful short-form last, so its expected
    # resolution target is well-defined)
    sec2_text = c(
        F.lit("Normative and informative references."),
        opt("bcp_num", F.lit(" This practice is documented in BCP "),
            F.col("bcp_num"), F.lit(".")),
        opt("std_num", F.lit(" See also STD "), F.col("std_num"),
            F.lit(".")),
        opt("draft_slug", F.lit(" A newer revision appears in "),
            F.col("draft_slug"), F.lit(".")),
        opt("doi_id", F.lit(" Published at doi:"), F.col("doi_id"),
            F.lit(".")),
        opt("iso_num", F.lit(" Timestamps follow ISO "), F.col("iso_num"),
            F.lit(":"), F.col("iso_year"), F.lit(".")),
        opt("eu_num", F.lit(" Processing is governed by Directive "),
            F.col("eu_year2"), F.lit("/"), F.col("eu_num"), F.lit("/EC.")),
        opt("case_num", F.lit(" Interpreted in Case C-"),
            F.col("case_num"), F.lit("/"), F.col("case_year2"),
            F.lit(".")),
        opt("list_a", F.lit(" It consolidates RFCs "), F.col("list_a"),
            F.lit(", "), F.col("list_b"), F.lit(" and "), F.col("list_c"),
            F.lit(".")),
        opt("art_num", F.lit(" Compliance follows Articles "),
            F.col("art_a1"), F.lit(" and "), F.col("art_a2"),
            F.lit(" of Directive "), F.col("art_year4"), F.lit("/"),
            F.col("art_num"), F.lit("/EC.")),
        opt("ns_doc", F.lit(" Implementations follow Items "),
            F.col("ns_i1"), F.lit(" and "), F.col("ns_i2"),
            F.lit(" of Section "), F.col("ns_sec"),
            F.lit(" of Chapter "), F.col("ns_chap"),
            F.lit(" of RFC "), F.col("ns_doc"), F.lit(".")),
        opt("ext_url", F.lit(" The registry lives at "), F.col("ext_url"),
            F.lit(".")),
        opt("that_sec", F.lit(" Section "), F.col("that_sec"),
            F.lit(" of that document applies.")))

    updates_line = F.when(
        F.col("updates").isNotNull(),
        c(F.lit("<p>Updates: "), F.col("updates"), F.lit("</p>"))
    ).otherwise(F.lit(""))

    html_str = c(
        F.lit('<html lang="'), F.col("lang"), F.lit('"><head><title>'),
        F.col("title"),
        F.lit("</title><script>var t=1;</script></head><body>"),
        F.lit('<div class="header"><p>'), F.col("publisher"),
        F.lit("</p><p>Request for Comments: "), F.col("doc_id").cast("string"),
        F.lit("</p><p>Category: "), F.col("category"), F.lit("</p>"),
        updates_line,
        F.lit("<p>"), F.col("month"), F.lit(" "), F.col("year"),
        F.lit("</p></div><h1>"), F.col("title"), F.lit("</h1>"),
        F.lit("<script>document.write('NOISE');</script>"),
        F.lit('<div class="section" about="#S1"><h2>1. Introduction</h2><p>'),
        sec1_text,
        F.lit('</p></div><div class="section" about="#S1.1">'
              "<h3>1.1. Details</h3><p>"),
        sec11_text,
        F.lit("</p><font>noise</font></div>"
              '<div class="section" about="#S2">'
              "<h2>2. References</h2><p>"),
        sec2_text,
        F.lit("</p></div></body></html>"))

    # expected extracted text (chunks joined with single spaces) — the
    # byte-identical per-url invariant, reconstructed declaratively
    expected_text = c(
        F.col("publisher"),
        F.lit(" Request for Comments: "), F.col("doc_id").cast("string"),
        F.lit(" Category: "), F.col("category"),
        F.when(F.col("updates").isNotNull(),
               c(F.lit(" Updates: "), F.col("updates"))).otherwise(F.lit("")),
        F.lit(" "), F.col("month"), F.lit(" "), F.col("year"),
        F.lit(" "), F.col("title"),
        F.lit(" 1. Introduction "), sec1_text,
        F.lit(" 1.1. Details "), sec11_text,
        F.lit(" 2. References "), sec2_text)

    return f.select(
        F.col("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 137
                            ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        expected_text.alias("text"),
        "lang")


STATUTE_CHAPTER_TITLES = ["General Provisions", "Obligations", "Supervision"]


def statute_pages_from_documents(documents: DataFrame) -> DataFrame:
    """documents → plain-text statute pages (url, text), pure columns.

    The statute-depth corpus for the structure parser
    (operators/structure.py): every doc is a 5-level act — chapters
    ("Chapter N. Title"), continuously-numbered sections ("N §"),
    pieces (plain paragraphs), numbered items ("1."), letter items
    ("a)") — all derived from doc_id arithmetic so the expected node
    tree is reconstructible in ANSI SQL:

      nchap    = doc_id % 2 + 2          (2-3 chapters)
      sections = 2 per chapter, numbered 2(c-1)+1, 2(c-1)+2
      piece 2  iff section % 3 == 0
      items    iff section % 2 == 1      (two numbered items)
      letters  iff additionally doc_id % 5 == 0 (a/b under item 2)
    """
    d = F.col("doc_id").cast("long")
    nchap = d % 2 + 2

    def sec_block(s):
        s_str = s.cast("string")
        items = F.when(
            s % 2 == 1,
            F.concat(
                F.lit("1. first item of section "), s_str, F.lit(".\n\n"),
                F.lit("2. second item of section "), s_str, F.lit(".\n\n"),
                F.when(d % 5 == 0,
                       F.lit("a) first letter item.\n\n"
                             "b) second letter item.\n\n"))
                .otherwise(F.lit("")))).otherwise(F.lit(""))
        piece2 = F.when(
            s % 3 == 0,
            F.concat(F.lit("Second piece of section "), s_str,
                     F.lit(".\n\n"))).otherwise(F.lit(""))
        return F.concat(
            s_str, F.lit(" § Provisions on handling.\n\n"),
            F.lit("First piece of section "), s_str, F.lit(".\n\n"),
            items, piece2)

    chap_arr = F.transform(
        F.sequence(F.lit(1).cast("long"), nchap),
        lambda c: F.concat(
            F.lit("Chapter "), c.cast("string"), F.lit(". "),
            F.element_at(
                F.array(*[F.lit(t) for t in STATUTE_CHAPTER_TITLES]),
                c.cast("int")),
            F.lit("\n\n"),
            sec_block(2 * (c - 1) + 1),
            sec_block(2 * (c - 1) + 2)))

    return documents.select(
        F.concat(F.lit(BASE + "res/act/"), d.cast("string")).alias("url"),
        F.array_join(chap_arr, "").alias("text"))


def doc_versions_from_documents(documents: DataFrame) -> DataFrame:
    """documents → version-archive rows (url, version, valid_from,
    valid_to, archive_uri), pure columns: doc d has d%3+1 versions
    v0..v(d%3), effective every 37 days from a per-doc epoch;
    non-current versions live under the reference-style ``/arkiv/``
    path (documentstore.py:781-820).

    Two-sided validity (TemporalElement.in_effect, elements.py:
    417-447): a superseded version expires when its successor enters
    into force (valid_to = valid_from + 37); the CURRENT version is
    open-ended (valid_to null) except for repealed documents
    (d % 6 == 5), whose final version expires 30 days after entry —
    so some fixture docs are repealed before, some after, any given
    as-of date."""
    d = F.col("doc_id").cast("long")
    url = F.concat(F.lit(BASE + "res/doc/"), d.cast("string"))
    n_extra = d % 3
    return documents.select(d.alias("doc_id"), url.alias("url"),
                            n_extra.alias("_n"),
                            (d % 6 == 5).alias("_repealed")).select(
        "url",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n")))
        .alias("_v"),
        F.col("_n"), F.col("_repealed")).select(
        "url",
        F.concat(F.lit("v"), F.col("_v").cast("string")).alias("version"),
        F.date_add(
            F.lit("2020-01-01").cast("date"),
            (F.regexp_extract("url", r"(\d+)$", 1).cast("int") % 200
             + F.col("_v").cast("int") * 37)).alias("valid_from"),
        F.when(
            F.col("_v") < F.col("_n"),
            F.date_add(
                F.lit("2020-01-01").cast("date"),
                (F.regexp_extract("url", r"(\d+)$", 1).cast("int") % 200
                 + F.col("_v").cast("int") * 37 + 37)))
        .when(
            F.col("_repealed"),
            F.date_add(
                F.lit("2020-01-01").cast("date"),
                (F.regexp_extract("url", r"(\d+)$", 1).cast("int") % 200
                 + F.col("_v").cast("int") * 37 + 30)))
        .alias("valid_to"),
        F.when(F.col("_v") == F.col("_n"), F.col("url"))
        .otherwise(F.concat(F.col("url"), F.lit("/arkiv/v"),
                            F.col("_v").cast("string")))
        .alias("archive_uri"))

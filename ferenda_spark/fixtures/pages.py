"""Deterministic synthetic Common-Crawl-style pages corpus.

Generates the BASELINE input table shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus ground-truth side tables derived *by construction*:

* ``golden_triples`` — the oracle for triple P/R (schema per FIXTURES.md §2.1)
* ``golden_text``    — md5-per-url oracle for the extract stage
* ``entities``       — broadcast-sized publisher dimension (FIXTURES.md §3.1)

Pages are RFC-like documents (modeled on the reference's RFC repo,
/root/reference/ferenda/sources/tech/rfc.py): a header key/value block,
preamble, and numbered sections whose paragraphs embed citations
``[RFC n]``, ``section s of [RFC n]``, bare URLs, and per-document
alias definitions (the stateful-grammar analog of legalref.py's
``currentlynamedlaws``). Citation targets are zipf-distributed so a few
pages are heavily cited (head-entity skew, per the north star).

Every document is generated from ``seed = f(global_seed, n)`` alone, so
generation is embarrassingly parallel and partition-count invariant —
the same doc id yields the same bytes on 1 core or 1000 executors.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as html_mod
import random
from typing import Iterator

import pandas as pd

from ferenda_spark.functions.text import normalize_space, strip_backspace

BASE = "https://example.org/"

# qname predicates (FIXTURES.md §2.1)
RDF_TYPE = "rdf:type"
DCT_TITLE = "dcterms:title"
DCT_IDENTIFIER = "dcterms:identifier"
DCT_ISSUED = "dcterms:issued"
DCT_PUBLISHER = "dcterms:publisher"
DCT_SUBJECT = "dcterms:subject"
DCT_REFERENCES = "dcterms:references"
DCT_ISPARTOF = "dcterms:isPartOf"
RFC_UPDATES = "rfc:updates"
RFC_OBSOLETES = "rfc:obsoletes"
BIBO_CHAPTER = "bibo:chapter"
BIBO_DOCPART = "bibo:DocumentPart"
BIBO_STANDARD = "bibo:Standard"
BIBO_REPORT = "bibo:Report"

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]

CATEGORIES = [
    "Standards Track", "Informational", "Experimental",
    "Best Current Practice", "Historic",
]
CATEGORY_TYPE = {
    "Standards Track": BIBO_STANDARD,
    "Best Current Practice": BIBO_STANDARD,
    "Informational": BIBO_REPORT,
    "Experimental": BIBO_REPORT,
    "Historic": BIBO_REPORT,
}

# Publisher dimension: (canonical label, [close variants >=0.8],
# [far variants <0.8 that must NOT link]).
PUBLISHERS = [
    ("Network Working Group",
     ["Network Working Grp", "Network Working Group."], []),
    ("Internet Engineering Task Force",
     ["Internet Enginering Task Force", "Internet Engineering Taskforce"], []),
    ("Internet Architecture Board",
     ["Internet Architecture Boards"], []),
    ("Internet Research Task Force",
     ["Internet Research TaskForce"], []),
    ("World Wide Web Consortium",
     ["World Wide Web Consortum"], ["W3 Consortium Publishing House"]),
]

TITLE_WORDS = [
    "Hypertext", "Transfer", "Datagram", "Routing", "Extension",
    "Congestion", "Stream", "Framework", "Protocol", "Mechanism",
    "Addressing", "Multiplexing", "Security", "Gateway", "Header",
]

FILLER = (
    "The key words MUST and SHOULD in this document are to be "
    "interpreted as described below. Implementations processing a "
    "message that contains an unknown field ought to ignore the "
    "field & continue"
).split(" ")

SECTION_HEADINGS = [
    "Introduction", "Terminology", "Overview", "Message Format",
    "Processing Rules", "Error Handling", "Security Considerations",
    "IANA Considerations", "Acknowledgements",
]

ALIAS_NAMES = ["HTPX", "DGRAM", "MUXP", "SECF", "RTNG"]


def doc_uri(n: int) -> str:
    return f"{BASE}res/rfc/{n}"


def category_uri(category: str) -> str:
    slug = category.lower().replace(" ", "-")
    return f"{BASE}res/category/{slug}"


def publisher_uri(label: str) -> str:
    slug = label.lower().replace(" ", "-")
    return f"{BASE}res/org/{slug}"


def _zipf_target(rng: random.Random, n_docs: int, exclude: int) -> int:
    """Zipf(a=1.6)-distributed citation target in 1..n_docs (skewed head)."""
    while True:
        # inverse-CDF-ish: rank via pareto
        r = int(rng.paretovariate(0.6)) % n_docs + 1
        if r != exclude:
            return r


def _filler(rng: random.Random, lo: int = 6, hi: int = 18) -> str:
    k = rng.randint(lo, hi)
    return " ".join(rng.choice(FILLER) for _ in range(k))


def gen_doc(n: int, n_docs: int, seed: int = 42) -> dict:
    """Generate one document's structured form, seeded by (seed, n)."""
    rng = random.Random(f"{seed}:{n}")
    lang = "sv" if rng.random() < 0.1 else "en"
    is_doc = rng.random() >= 0.08  # ~8% non-document index pages

    if not is_doc:
        url = f"{BASE}index/page{n}"
        paras = [_filler(rng) + " index listing " + _filler(rng, 3, 6)
                 for _ in range(rng.randint(1, 3))]
        return {
            "n": n, "url": url, "is_doc": False, "lang": lang,
            "title": f"Index page {n}", "paras": paras, "sections": [],
            "header": [], "golden": [],
        }

    url = doc_uri(n)
    title = " ".join(rng.sample(TITLE_WORDS, 3)) + f" (v{n % 7})"
    pub_idx = rng.randrange(len(PUBLISHERS))
    canonical, close, far = PUBLISHERS[pub_idx]
    roll = rng.random()
    if roll < 0.6:
        pub_label, pub_link = canonical, publisher_uri(canonical)
    elif roll < 0.9 and close:
        pub_label, pub_link = rng.choice(close), publisher_uri(canonical)
    elif far:
        pub_label, pub_link = rng.choice(far), None
    else:
        pub_label, pub_link = canonical, publisher_uri(canonical)

    category = rng.choice(CATEGORIES)
    month = rng.choice(MONTHS)
    year = 1990 + (n % 35)
    updates = sorted({_zipf_target(rng, n_docs, n) for _ in range(rng.randint(0, 2))})
    obsoletes = sorted({_zipf_target(rng, n_docs, n) for _ in range(rng.randint(0, 1))})

    header = [("Publisher", pub_label),
              ("Request for Comments", str(n)),
              ("Category", category)]
    if updates:
        header.append(("Updates", ", ".join(str(u) for u in updates)))
    if obsoletes:
        header.append(("Obsoletes", ", ".join(str(o) for o in obsoletes)))
    header.append(("Date", f"{month} {year}"))

    golden: list[tuple] = []
    uri = url
    issued = f"{year}-{MONTHS.index(month) + 1:02d}"
    golden.append((uri, RDF_TYPE, CATEGORY_TYPE[category], False, None, None))
    golden.append((uri, DCT_TITLE, title, True, None, lang))
    golden.append((uri, DCT_IDENTIFIER, f"RFC {n}", True, None, None))
    golden.append((uri, DCT_ISSUED, issued, True, "xsd:gYearMonth", None))
    golden.append((uri, DCT_SUBJECT, category_uri(category), False, None, None))
    if pub_link:
        golden.append((uri, DCT_PUBLISHER, pub_link, False, None, None))
    for u in updates:
        golden.append((uri, RFC_UPDATES, doc_uri(u), False, None, None))
    for o in obsoletes:
        golden.append((uri, RFC_OBSOLETES, doc_uri(o), False, None, None))

    # Per-document alias (stateful-grammar analog): defined in the
    # first section, referenced later in the same document only.
    alias = None
    if rng.random() < 0.4:
        alias = (rng.choice(ALIAS_NAMES), _zipf_target(rng, n_docs, n))

    # preamble paragraphs (doc-level text, no fragment)
    paras = [
        "Abstract",
        _filler(rng) + ". This memo describes the " + title.lower() + ".",
        "Status of This Memo",
        _filler(rng, 4, 10) + ".",
    ]

    sections = []
    n_top = rng.randint(2, 4)
    seen_frags: set[str] = set()
    for i in range(1, n_top + 1):
        ords = [str(i)]
        if rng.random() < 0.6:
            ords.append(f"{i}.1")
            if rng.random() < 0.3:
                ords.append(f"{i}.1.1")
        if rng.random() < 0.3:
            ords.append(f"{i}.2")
        for ordinal in ords:
            heading = rng.choice(SECTION_HEADINGS)
            frag = f"{uri}#S{ordinal}"
            parent = (f"{uri}#S{ordinal.rsplit('.', 1)[0]}"
                      if "." in ordinal else uri)
            golden.append((frag, RDF_TYPE, BIBO_DOCPART, False, None, None))
            golden.append((frag, BIBO_CHAPTER, ordinal, True, None, None))
            golden.append((frag, DCT_ISPARTOF, parent, False, None, None))
            golden.append((frag, DCT_TITLE, heading, True, None, lang))
            seen_frags.add(frag)

            sec_paras = []
            n_paras = rng.randint(1, 3)
            for _ in range(n_paras):
                pieces = [_filler(rng)]
                n_cites = rng.randint(0, 3)
                for _ in range(n_cites):
                    target = _zipf_target(rng, n_docs, n)
                    kind = rng.random()
                    if kind < 0.45:
                        pieces.append(f"[RFC {target}]")
                        golden.append((frag, DCT_REFERENCES, doc_uri(target),
                                       False, None, None))
                    elif kind < 0.7:
                        s = f"{rng.randint(1, 5)}.{rng.randint(1, 4)}"
                        pieces.append(f"section {s} of [RFC {target}]")
                        golden.append((frag, DCT_REFERENCES,
                                       f"{doc_uri(target)}#S{s}",
                                       False, None, None))
                    elif kind < 0.9:
                        ext = f"https://www.example.com/spec/{target}"
                        trail = rng.choice(["", ".", ","])
                        pieces.append(ext + trail)
                        golden.append((frag, DCT_REFERENCES, ext,
                                       False, None, None))
                    elif kind < 0.93:
                        # distributed article list (eu_article class):
                        # one match, two links sharing the directive
                        a1 = rng.randint(1, 20)
                        a2 = a1 + rng.randint(1, 5)
                        dy = 1984 + rng.randint(0, 40)
                        dn = rng.randint(1, 200)
                        pieces.append(
                            f"Articles {a1} and {a2} of Directive "
                            f"{dy}/{dn}/EC")
                        for a in (a1, a2):
                            golden.append((
                                frag, DCT_REFERENCES,
                                f"{BASE}res/eu/dir/{dy}/{dn}#A{a}",
                                False, None, None))
                    elif alias is not None:
                        pieces.append(f"[{alias[0]}]")
                        golden.append((frag, DCT_REFERENCES,
                                       doc_uri(alias[1]), False, None, None))
                    pieces.append(_filler(rng, 3, 8))
                sec_paras.append(" ".join(pieces) + ".")
            # alias definition sentence goes into section 1's first para
            if alias is not None and ordinal == "1":
                sec_paras[0] = (
                    f"In this document, [{alias[0]}] refers to "
                    f"[RFC {alias[1]}]. " + sec_paras[0]
                )
                golden.append((frag, DCT_REFERENCES, doc_uri(alias[1]),
                               False, None, None))
            sections.append({"ordinal": ordinal, "heading": heading,
                             "paras": sec_paras})

    return {
        "n": n, "url": url, "is_doc": True, "lang": lang, "title": title,
        "header": header, "paras": paras, "sections": sections,
        "golden": golden,
    }


# --- rendering -----------------------------------------------------------

def _noisy(rng: random.Random, s: str) -> str:
    """Inject whitespace noise that extraction must normalize away:
    newlines + indentation, NBSP, double spaces, an overstrike pair."""
    words = s.split(" ")
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i == len(words) - 1:
            break
        r = rng.random()
        if r < 0.06:
            out.append("\n   ")
        elif r < 0.09:
            out.append("\xa0")
        elif r < 0.12:
            out.append("  ")
        else:
            out.append(" ")
    s = "".join(out)
    if rng.random() < 0.1 and "M\x08" not in s:
        s = s.replace("MUST", "M\x08MU\x08US\x08ST\x08T", 1)
    return s


def render_html(doc: dict, seed: int = 42) -> bytes:
    """Render the structured doc to XHTML bytes (with noise tags)."""
    rng = random.Random(f"html:{seed}:{doc['n']}")
    esc = html_mod.escape
    parts = [
        f'<html lang="{doc["lang"]}"><head>'
        f"<title>{esc(doc['title'])}</title>"
        "<script>var tracking = 1;</script>"
        '<style>p { margin: 0 }</style></head><body>'
    ]
    if doc["header"]:
        parts.append('<div class="header">')
        for k, v in doc["header"]:
            if k == "Publisher":
                parts.append(f"<p>{esc(_noisy(rng, v))}</p>")
            elif k == "Date":
                parts.append(f"<p>{esc(_noisy(rng, v))}</p>")
            else:
                parts.append(f"<p>{esc(k)}: {esc(v)}</p>")
        parts.append("</div>")
    parts.append(f"<h1>{esc(_noisy(rng, doc['title']))}</h1>")
    parts.append("<script>document.write('NOISE');</script>")
    for p in doc["paras"]:
        parts.append(f"<p>{esc(_noisy(rng, p))}</p>")
    for sec in doc["sections"]:
        level = min(sec["ordinal"].count(".") + 2, 6)
        parts.append(f'<div class="section" about="#S{sec["ordinal"]}">')
        parts.append(
            f"<h{level}>{sec['ordinal']}. {esc(_noisy(rng, sec['heading']))}</h{level}>"
        )
        for p in sec["paras"]:
            parts.append(f"<p>{esc(_noisy(rng, p))}</p>")
        parts.append("<font>deprecated tag noise</font>")
        parts.append("</div>")
    parts.append("<map><area alt='nav'/></map></body></html>")
    return "".join(parts).encode("utf-8")


def render_text(doc: dict, seed: int = 42) -> str:
    """Reference-semantics extracted text, computed from the structured
    form (NOT by parsing the HTML — the extract stage must arrive at the
    identical string by parsing ``render_html``'s bytes).

    Semantics (modeled on elements_from_soup + as_plaintext,
    /root/reference/ferenda/elements/html.py:23-71 and
    elements/elements.py:249-261): body-selected; script/style/font/map/
    center dropped; block chunks (header lines, headings, paragraphs)
    whitespace-normalized and joined with single spaces.
    """
    rng = random.Random(f"html:{seed}:{doc['n']}")
    chunks: list[str] = []

    def add(raw: str) -> None:
        c = normalize_space(strip_backspace(raw))
        if c:
            chunks.append(c)

    for k, v in doc["header"]:
        if k in ("Publisher", "Date"):
            add(_noisy(rng, v))
        else:
            add(f"{k}: {v}")
    add(_noisy(rng, doc["title"]))
    for p in doc["paras"]:
        add(_noisy(rng, p))
    for sec in doc["sections"]:
        add(f"{sec['ordinal']}. {_noisy(rng, sec['heading'])}")
        for p in sec["paras"]:
            add(_noisy(rng, p))
    return " ".join(chunks)


def _warc_ts(n: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=137 * n)


# --- pandas (local, test-sized) ------------------------------------------

def gen_corpus_pandas(n_docs: int, seed: int = 42):
    """Return (pages, golden_triples, golden_text) pandas DataFrames."""
    pages, triples, texts = [], [], []
    for n in range(1, n_docs + 1):
        doc = gen_doc(n, n_docs, seed)
        text = render_text(doc, seed)
        pages.append({
            "url": doc["url"], "warc_ts": _warc_ts(n),
            "html": render_html(doc, seed), "text": text,
            "lang": doc["lang"],
        })
        texts.append({
            "url": doc["url"],
            "text_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
        })
        for (s, p, o, lit, dtp, olang) in doc["golden"]:
            triples.append({
                "subj": s, "pred": p, "obj": o, "obj_is_literal": lit,
                "obj_datatype": dtp, "obj_lang": olang,
            })
    tri = pd.DataFrame(triples).drop_duplicates()
    return pd.DataFrame(pages), tri, pd.DataFrame(texts)


def entities_pandas() -> pd.DataFrame:
    rows = []
    for canonical, close, far in PUBLISHERS:
        rows.append({
            "uri": publisher_uri(canonical), "label": canonical,
            "alt_labels": close, "kind": "publisher",
        })
    for c in CATEGORIES:
        rows.append({
            "uri": category_uri(c), "label": c,
            "alt_labels": [], "kind": "category",
        })
    return pd.DataFrame(rows)


# --- distributed (bench-sized) -------------------------------------------

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")
TRIPLES_SCHEMA = ("subj string, pred string, obj string, "
                  "obj_is_literal boolean, obj_datatype string, "
                  "obj_lang string")


def pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed page generation: spark.range → mapInPandas.

    Each row depends only on (seed, id), so output is identical for any
    partitioning — the property that makes the corpus usable as a
    determinism oracle across parallelism levels.
    """
    base = spark.range(1, n_docs + 1, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n in pdf["id"]:
                n = int(n)
                doc = gen_doc(n, n_docs, seed)
                rows.append({
                    "url": doc["url"], "warc_ts": _warc_ts(n),
                    "html": render_html(doc, seed),
                    "text": render_text(doc, seed), "lang": doc["lang"],
                })
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def golden_triples_df(spark, n_docs: int, seed: int = 42,
                      partitions: int | None = None):
    base = spark.range(1, n_docs + 1, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n in pdf["id"]:
                doc = gen_doc(int(n), n_docs, seed)
                for (s, p, o, lit, dtp, olang) in doc["golden"]:
                    rows.append({"subj": s, "pred": p, "obj": o,
                                 "obj_is_literal": lit, "obj_datatype": dtp,
                                 "obj_lang": olang})
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=TRIPLES_SCHEMA).dropDuplicates()


def golden_text_df(spark, n_docs: int, seed: int = 42):
    from pyspark.sql import functions as F
    return pages_df(spark, n_docs, seed).select(
        "url", F.md5(F.encode("text", "utf-8")).alias("text_md5"))


def entities_df(spark):
    return spark.createDataFrame(entities_pandas())

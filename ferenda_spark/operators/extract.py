"""Extract stage: HTML bytes → text + header k/v + section rows.

The single Python-side stage of the pipeline, run as ``mapInPandas``
(Arrow batches; the parser class is instantiated per *task*, rows are
processed vectorized per batch — no per-row Python at the Spark API
layer).

Semantics are modeled on the reference's soup → element-tree → plain
text chain (/root/reference/ferenda/elements/html.py:23-71
``elements_from_soup``: drop script/style/font/map/center;
/root/reference/ferenda/elements/elements.py:249-261 ``as_plaintext``:
whitespace-normalize each chunk, join non-empty chunks with single
spaces; /root/reference/ferenda/sources/tech/rfc.py:462-467 backspace
overstrike strip; /root/reference/ferenda/documentrepository.py:1277-1317
``parse_metadata_from_soup`` header extraction). The per-url output
``text`` is byte-identical to the reference-semantics extraction — the
BASELINE per-row invariant.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ferenda_spark.functions.text import (
    clean_xml_chars,
    normalize_space,
    strip_backspace,
)

DROP_TAGS = frozenset({"script", "style", "font", "map", "center"})
BLOCK_TAGS = frozenset({"p", "h1", "h2", "h3", "h4", "h5", "h6", "li"})

_HEADER_KV_RE = re.compile(
    r"^(Request for Comments|Category|Updates|Obsoletes|STD|BCP): (.*)$")
_DATE_RE = re.compile(
    r"^(January|February|March|April|May|June|July|August|September|"
    r"October|November|December) (\d{4})$")
_SECTION_PREFIX_RE = re.compile(r"^(\d+(?:\.\d+)*)\. ")

EXTRACT_SCHEMA = (
    "url string, lang string, is_doc boolean, text string, title string, "
    "preamble string, header map<string,string>, "
    "sections array<struct<ordinal:string, heading:string, text:string>>, "
    "publisher_uri string"
)


class _PageParser(HTMLParser):
    """Streaming HTML parser producing (fragment-tagged) text chunks.

    Chunks are the texts of block elements (p, h1-h6, li) inside
    <body>, with DROP_TAGS subtrees removed. Each chunk is tagged with
    the section ordinal of the nearest enclosing ``about="#S..."``
    container (None for document-level chunks, "header" for chunks in
    a ``class="header"`` div).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.in_body = False
        self.skip_depth = 0
        self.block_buf: list[str] | None = None
        self.div_stack: list[str | None] = []  # section ordinal or None
        self.current_section: str | None = None
        self.in_header_div = False
        self.chunks: list[tuple[str | None, bool, str]] = []
        # (section_ordinal, is_header, normalized_chunk)

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            self.in_body = True
            return
        if tag in DROP_TAGS:
            self.skip_depth += 1
            return
        if not self.in_body or self.skip_depth:
            return
        if tag == "div":
            a = dict(attrs)
            about = a.get("about", "")
            if about.startswith("#S"):
                self.div_stack.append(about[2:])
                self.current_section = about[2:]
            else:
                self.div_stack.append(None)
                if a.get("class") == "header":
                    self.in_header_div = True
            return
        if tag in BLOCK_TAGS:
            self.block_buf = []

    def handle_endtag(self, tag):
        if tag == "body":
            self.in_body = False
            return
        if tag in DROP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if not self.in_body:
            return
        if tag == "div" and self.div_stack:
            popped = self.div_stack.pop()
            if popped is not None:
                self.current_section = next(
                    (s for s in reversed(self.div_stack) if s is not None),
                    None)
            else:
                self.in_header_div = any(
                    s is None for s in self.div_stack) and self.in_header_div
                if not self.div_stack:
                    self.in_header_div = False
                else:
                    # only the outermost header div matters in practice
                    self.in_header_div = False
            return
        if tag in BLOCK_TAGS and self.block_buf is not None:
            raw = "".join(self.block_buf)
            chunk = normalize_space(clean_xml_chars(strip_backspace(raw)))
            if chunk:
                self.chunks.append(
                    (self.current_section, self.in_header_div, chunk))
            self.block_buf = None

    def handle_data(self, data):
        if self.in_body and not self.skip_depth and self.block_buf is not None:
            self.block_buf.append(data)

    def flush(self) -> None:
        """Finalize an unterminated block at EOF (truncated/invalid
        real-web HTML must still yield its text)."""
        if self.block_buf is not None:
            raw = "".join(self.block_buf)
            chunk = normalize_space(clean_xml_chars(strip_backspace(raw)))
            if chunk:
                self.chunks.append(
                    (self.current_section, self.in_header_div, chunk))
            self.block_buf = None


def parse_page(html_bytes: bytes) -> dict:
    """Parse one page's bytes into text / title / header / sections."""
    parser = _PageParser()
    parser.feed(html_bytes.decode("utf-8", errors="replace"))
    parser.close()
    parser.flush()

    text = " ".join(c for _, _, c in parser.chunks)
    header: dict[str, str] = {}
    title = None
    preamble: list[str] = []  # doc-level (non-header, non-section) chunks
    sections: list[dict] = []
    sec_index: dict[str, dict] = {}

    for ordinal, in_header, chunk in parser.chunks:
        if in_header and ordinal is None:
            m = _HEADER_KV_RE.match(chunk)
            if m:
                header[m.group(1)] = m.group(2)
                continue
            m = _DATE_RE.match(chunk)
            if m:
                header["Date"] = chunk
                continue
            header.setdefault("Publisher", chunk)
            continue
        if ordinal is None:
            if title is None:
                title = chunk  # first non-header doc-level block = h1 title
            preamble.append(chunk)
            continue
        sec = sec_index.get(ordinal)
        if sec is None:
            m = _SECTION_PREFIX_RE.match(chunk)
            heading = chunk[m.end():] if m else chunk
            sec = {"ordinal": ordinal, "heading": heading, "text": chunk}
            sec_index[ordinal] = sec
            sections.append(sec)
        else:
            sec["text"] = sec["text"] + " " + chunk

    return {"text": text, "title": title, "header": header,
            "preamble": " ".join(preamble), "sections": sections}


DOC_URL_RE = r"^https://example\.org/res/rfc/\d+$"


def _make_publisher_resolver(entity_labels):
    """(label → uri) resolver with the linker's exact→fuzzy semantics
    (lookup_resource, documentrepository.py:500-547): exact match on
    the normalized label, else difflib.get_close_matches cutoff 0.8
    top-1. Memoized per task — labels repeat heavily."""
    import difflib
    exact = {normalize_space(lb): uri for lb, uri in entity_labels}
    keys = sorted(exact)
    memo: dict = {}

    def resolve(label):
        if label is None:
            return None
        norm = normalize_space(label)
        if norm in memo:
            return memo[norm]
        uri = exact.get(norm)
        if uri is None:
            best = difflib.get_close_matches(norm, keys, n=1, cutoff=0.8)
            uri = exact[best[0]] if best else None
        memo[norm] = uri
        return uri

    return resolve


def extract(pages: DataFrame, doc_url_regex: str = DOC_URL_RE,
            entity_labels: list | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text?, lang) → extracted DataFrame.

    Reads only (url, html, lang) — column pruning keeps the scan
    narrow. Document discovery (reference: basefile_regex link
    matching, documentrepository.py:892-935) is the ``is_doc`` flag.

    ``entity_labels`` (list of (label, uri), broadcast-sized) folds
    publisher entity-linking into this single Python stage
    (``publisher_uri`` column) — the fused fast path; without it the
    column is null and linking happens via the linker join operator.
    """
    url_re = re.compile(doc_url_regex)
    src = pages.select("url", "html", "lang")
    labels = entity_labels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolve = _make_publisher_resolver(labels) if labels else None
        for pdf in batches:
            out = []
            for url, html_bytes, lang in zip(pdf["url"], pdf["html"],
                                             pdf["lang"]):
                parsed = parse_page(bytes(html_bytes))
                out.append({
                    "url": url,
                    "lang": lang,
                    "is_doc": bool(url_re.match(url)),
                    "text": parsed["text"],
                    "title": parsed["title"],
                    "preamble": parsed["preamble"],
                    "header": parsed["header"],
                    "sections": parsed["sections"],
                    "publisher_uri": (
                        resolve(parsed["header"].get("Publisher"))
                        if resolve else None),
                })
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=EXTRACT_SCHEMA)

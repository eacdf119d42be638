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
        # body content is implicit per the HTML spec (the <body> tag
        # is optional and missing from plenty of truncated real-web
        # pages) — collect everywhere EXCEPT inside <head>
        self.in_head = False
        self.in_body = True
        self.skip_depth = 0
        # stack of open block-element text buffers (blocks nest:
        # li > p); a single buffer dropped the outer block's text
        self.block_stack: list[list[str]] = []
        # div kinds: ("sec", ordinal) | ("hdr", None) | ("plain", None)
        self.div_stack: list[tuple[str, str | None]] = []
        self.current_section: str | None = None
        self.in_header_div = False
        self.chunks: list[tuple[str | None, bool, str]] = []
        # (section_ordinal, is_header, normalized_chunk)

    def _collecting(self) -> bool:
        return self.in_body and not self.in_head and not self.skip_depth

    def _emit(self, raw: str) -> None:
        chunk = normalize_space(clean_xml_chars(strip_backspace(raw)))
        if chunk:
            self.chunks.append(
                (self.current_section, self.in_header_div, chunk))

    def handle_starttag(self, tag, attrs):
        if tag == "head":
            self.in_head = True
            return
        if tag == "body":
            self.in_head = False
            self.in_body = True
            return
        if tag in DROP_TAGS:
            self.skip_depth += 1
            return
        if not self._collecting():
            return
        if tag == "div":
            a = dict(attrs)
            about = a.get("about", "")
            if about.startswith("#S"):
                self.div_stack.append(("sec", about[2:]))
                self.current_section = about[2:]
            else:
                kind = "hdr" if a.get("class") == "header" else "plain"
                self.div_stack.append((kind, None))
                if kind == "hdr":
                    self.in_header_div = True
            return
        if tag in BLOCK_TAGS:
            if self.block_stack and self.block_stack[-1]:
                # a block opening inside a block: flush the outer
                # prefix as its own chunk FIRST so chunks keep
                # reading order ("intro" before the nested "body",
                # the reference's as_plaintext order)
                self._emit("".join(self.block_stack[-1]))
                self.block_stack[-1] = []
            self.block_stack.append([])

    def handle_endtag(self, tag):
        if tag == "head":
            self.in_head = False
            return
        if tag == "body":
            self.in_body = False
            return
        if tag in DROP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        # end tags INSIDE a dropped subtree must not touch any stack
        # (HTMLParser only CDATA-modes script/style, so children of
        # font/map/center still stream through here)
        if not self.in_body or self.in_head or self.skip_depth:
            return
        if tag == "div" and self.div_stack:
            kind, _ = self.div_stack.pop()
            if kind == "sec":
                self.current_section = next(
                    (v for k, v in reversed(self.div_stack) if k == "sec"),
                    None)
            elif kind == "hdr":
                # header-ness ends only when no header div remains
                # open (a nested plain div must NOT clear it)
                self.in_header_div = any(
                    k == "hdr" for k, _ in self.div_stack)
            return
        if tag in BLOCK_TAGS and self.block_stack:
            self._emit("".join(self.block_stack.pop()))

    def handle_data(self, data):
        if self._collecting() and self.block_stack:
            self.block_stack[-1].append(data)

    def flush(self) -> None:
        """Finalize unterminated blocks at EOF (truncated/invalid
        real-web HTML must still yield its text)."""
        while self.block_stack:
            self._emit("".join(self.block_stack.pop()))


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


def _make_publisher_resolver(entity_labels, cutoff: float = 0.8):
    """(label → uri) resolver with the linker's exact→fuzzy semantics
    (lookup_resource, documentrepository.py:500-547): exact match on
    the normalized label, else difflib.get_close_matches top-1 inside
    the linker's lossless length band (see linker.py — comparing only
    entities whose length can reach the cutoff is a provable superset
    of every viable candidate, so results are byte-identical to the
    unblocked pass at O(band) instead of O(entities) per miss).
    Duplicate normalized labels resolve to the MINIMUM uri, matching
    the modular linker's deterministic tie-break. Memoized per task
    with a bounded table — labels repeat heavily.

    Parity note vs the modular linker: this per-row streaming
    resolver has no global view of distinct misses, so it carries no
    ``max_fuzzy_misses`` cap; on corpora whose distinct miss labels
    exceed that cap the modular path deterministically leaves the
    overflow unlinked while this path links it. Within the cap the
    two paths emit identical publisher edges."""
    import difflib
    import math

    from ferenda_spark.operators.linker import _MAX_ENTITY_DIM
    if len(entity_labels) > _MAX_ENTITY_DIM:
        raise ValueError(
            f"publisher resolver: entity dimension "
            f"({len(entity_labels)}) exceeds the broadcast contract "
            f"({_MAX_ENTITY_DIM}); use the join-based linker")
    exact: dict[str, str] = {}
    for lb, uri in entity_labels:
        if lb is None or uri is None:
            continue
        norm = normalize_space(lb)
        if norm and (norm not in exact or uri < exact[norm]):
            exact[norm] = uri
    by_len: dict[int, list[str]] = {}
    for k in sorted(exact):
        by_len.setdefault(len(k), []).append(k)
    lo_f = cutoff / (2.0 - cutoff)
    hi_f = (2.0 - cutoff) / cutoff
    memo: dict = {}

    def resolve(label):
        if label is None:
            return None
        norm = normalize_space(label)
        if norm in memo:
            return memo[norm]
        uri = exact.get(norm)
        if uri is None:
            lo = max(0, math.floor(len(norm) * lo_f))
            hi = math.ceil(len(norm) * hi_f)
            cands = [c for ln in range(lo, hi + 1)
                     for c in by_len.get(ln, ())]
            best = difflib.get_close_matches(norm, cands, n=1,
                                             cutoff=cutoff)
            uri = exact[best[0]] if best else None
        if len(memo) < 1_000_000:  # flat task memory on open-domain text
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

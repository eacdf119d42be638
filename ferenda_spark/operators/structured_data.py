"""schema.org JSON-LD structured-data extraction: pages → triples.

The Web Data Commons path: most structured knowledge on the open web
is embedded in pages as ``<script type="application/ld+json">``
blocks (schema.org markup), and a KG-construction job over a
Common-Crawl-style corpus harvests those blocks as ready-made triples
alongside the text-derived ones.  This is the *input-side* twin of
operators/render.py's RDFa output: the reference round-trips its
metadata through XHTML+RDFa pages (documentrepository.py:1277-1317
``parse_metadata_from_soup`` reads back what render wrote); here the
wild-web equivalent format is read instead.

Subset semantics (documented, fail-loud on the rest):

- every ld+json script block in the page is parsed independently; a
  block that is not valid JSON yields ONE error row (the warc.py /
  sitemaps.py contract) and never a task failure;
- a block is one node object or a top-level array of node objects
  (``@graph`` arrays likewise);
- subject = the node's ``@id``; an @id-less node gets the
  deterministic fragment IRI ``<page-url>#jsonld/<block>/<path>``
  (path = object keys / array ordinals from the block root), the
  skolemization answer rdf_serial.py uses for blank nodes — stable
  across partitions and replays because it derives only from the
  page url and the node's position;
- ``@type`` → one ``rdf:type`` triple per type; term expansion is
  CURIE-by-context: when the block's ``@context`` is a known
  vocabulary IRI (``CONTEXT_PREFIXES``, schema.org by default),
  compact terms become ``schema:Term`` / ``schema:property``;
  unknown contexts keep terms verbatim (never guessed);
- literals: strings (plain), numbers (``xsd:integer`` /
  ``xsd:double``), booleans (``xsd:boolean``), and
  ``{"@value": ..., "@language"/"@type": ...}`` objects; nested
  objects become an edge to the child node plus the child's own
  triples; arrays fan out one triple per element (order carried by
  the array ordinal in skolem paths only — RDF has no triple order);
- keyword keys other than the handled ones (``@context`` at block
  level) are skipped silently only for ``@context``; an unhandled
  ``@``-keyword inside a node yields an error row for the block
  (fail loud, the sparql.py parser contract).

Output shape is the engine's edge schema (subj, pred, obj,
obj_is_literal, obj_datatype, obj_lang) plus ``src_url`` and
``error``; one Arrow ``mapInPandas`` pass, stateless per page, no
shuffle — the same scan shape as extract.py, so at 10^12 pages this
runs inside the existing extract scan's budget.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

JSONLD_SCHEMA = ("src_url string, subj string, pred string, obj string, "
                 "obj_is_literal boolean, obj_datatype string, "
                 "obj_lang string, error string")

CONTEXT_PREFIXES = {
    "https://schema.org": "schema:",
    "http://schema.org": "schema:",
    "https://schema.org/": "schema:",
    "http://schema.org/": "schema:",
}

_SCRIPT_RE = re.compile(
    r"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>",
    re.IGNORECASE | re.DOTALL)

_KNOWN_KEYWORDS = {"@id", "@type", "@value", "@language", "@context",
                   "@graph"}


class _BlockError(ValueError):
    pass


def _expand(term: str, prefix: str | None) -> str:
    """Compact term → prefixed name under the block's context; terms
    that are already absolute IRIs or CURIE-looking stay verbatim."""
    if prefix is None or ":" in term or term.startswith("@"):
        return term
    return prefix + term


def _literal(value, lang=None):
    if isinstance(value, bool):
        return ("true" if value else "false", "xsd:boolean", None)
    if isinstance(value, int):
        return (str(value), "xsd:integer", None)
    if isinstance(value, float):
        return (repr(value), "xsd:double", None)
    return (str(value), None, lang)


def _walk(node: dict, subj_path: str, url: str, prefix: str | None,
          out: list) -> str:
    """Emit the triples of one node object; returns its subject."""
    if not isinstance(node, dict):
        raise _BlockError(f"node is {type(node).__name__}, not object")
    unknown = [k for k in node
               if k.startswith("@") and k not in _KNOWN_KEYWORDS]
    if unknown:
        raise _BlockError(f"unhandled keyword {unknown[0]!r}")
    subj = node.get("@id")
    if not isinstance(subj, str) or not subj:
        subj = f"{url}#jsonld/{subj_path}"
    types = node.get("@type", [])
    for t in types if isinstance(types, list) else [types]:
        if not isinstance(t, str):
            raise _BlockError("@type must be a string")
        out.append((subj, "rdf:type", _expand(t, prefix), False,
                    None, None))
    for key, value in node.items():
        if key in ("@id", "@type", "@context"):
            continue
        pred = _expand(key, prefix)
        values = value if isinstance(value, list) else [value]
        for i, v in enumerate(values):
            child_path = (f"{subj_path}/{key}/{i}"
                          if isinstance(value, list)
                          else f"{subj_path}/{key}")
            if isinstance(v, dict):
                if "@value" in v:
                    lit, dt, lang = _literal(
                        v["@value"], v.get("@language"))
                    if "@type" in v:
                        dt = _expand(str(v["@type"]), prefix)
                    out.append((subj, pred, lit, True, dt, lang))
                else:
                    child = _walk(v, child_path, url, prefix, out)
                    out.append((subj, pred, child, False, None, None))
            elif v is None:
                continue  # JSON null carries no triple
            else:
                lit, dt, lang = _literal(v)
                out.append((subj, pred, lit, True, dt, lang))
    return subj


def extract_jsonld(url: str, html: str) -> list[dict]:
    """Pure-Python twin: all triples of all ld+json blocks of one
    page, JSONLD_SCHEMA keys; one error row per bad block."""

    def row(subj=None, pred=None, obj=None, obj_is_literal=None,
            obj_datatype=None, obj_lang=None, error=None) -> dict:
        return {"src_url": url, "subj": subj, "pred": pred, "obj": obj,
                "obj_is_literal": obj_is_literal,
                "obj_datatype": obj_datatype, "obj_lang": obj_lang,
                "error": error}

    rows: list[dict] = []
    for b, block in enumerate(_SCRIPT_RE.findall(html or "")):
        try:
            data = json.loads(block)
        except ValueError as exc:
            rows.append(row(error=f"block {b}: json: {exc}"))
            continue
        ctx = data.get("@context") if isinstance(data, dict) else None
        prefix = (CONTEXT_PREFIXES.get(ctx)
                  if isinstance(ctx, str) else None)
        if isinstance(data, dict) and "@graph" in data:
            nodes = data["@graph"]
        else:
            nodes = data
        if not isinstance(nodes, list):
            nodes = [nodes]
        out: list[tuple] = []
        try:
            for n, node in enumerate(nodes):
                _walk(node, f"{b}" if len(nodes) == 1 else f"{b}/{n}",
                      url, prefix, out)
        except _BlockError as exc:
            rows.append(row(error=f"block {b}: {exc}"))
            continue
        rows.extend(row(*t) for t in out)
    return rows


def jsonld_triples(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """pages(url, html) → JSONLD_SCHEMA triples — one stateless Arrow
    pass (html may be binary or string), no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src_url", "subj", "pred", "obj", "obj_is_literal",
                "obj_datatype", "obj_lang", "error"]
        for pdf in it:
            rows: list[dict] = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if isinstance(html, (bytes, bytearray, memoryview)):
                    html = bytes(html).decode("utf-8", errors="replace")
                rows.extend(extract_jsonld(url, html))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select(url_col, html_col).mapInPandas(
        batches, schema=JSONLD_SCHEMA)

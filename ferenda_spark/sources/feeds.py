"""Syndication-feed reader: Atom + RSS 2.0 documents → entry rows.

The discovery-side twin of operators/render.py's ``atom_feeds``
writer, and the third leg of the crawl-frontier discovery trio
beside sitemaps (operators/sitemaps.py) and in-page link extraction:
a crawler that polls feeds sees new urls minutes after publication
instead of at the next full-site sweep, and the reference's whole
news/feed surface (ferenda's ``news()``/``feedsets``,
documentrepository.py:2482-2607, which both writes and serves Atom)
assumes feeds are a first-class interchange format.

Formats (fail-loud on the rest):

- **Atom** (RFC 4287, the writer's dialect): feed ``title`` +
  per-entry ``id`` / ``title`` / ``updated`` (RFC 3339) / ``link``
  — ``rel="alternate"`` preferred, first link in document order
  otherwise, href resolved against the feed url;
- **RSS 2.0**: channel ``title`` + per-item ``guid`` (falling back
  to the item link as id, the de-facto convention) / ``title`` /
  ``pubDate`` (RFC 822, via ``email.utils``) / ``link``;
- anything else (root element neither ``feed`` nor ``rss``), or XML
  that does not parse, yields ONE error row for the document and
  never a task failure (the warc.py / sitemaps.py contract).

Timestamps are normalized to UTC and returned naive (the engine's
session convention).  ``feed_entries`` is one stateless Arrow
``mapInPandas`` pass over (url, xml) — no shuffle; downstream
discovery is ``entries.select(link) anti-join visited`` on the
existing crawl-frontier machinery (operators/crawl.py).

Roundtrip identity with the writer (the atom_roundtrip_events
gate): ``feed_entries(atom_feeds(e, link_col=...))`` recovers every
(feed_title, entry_id, title, link, updated) of ``e``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame

FEED_SCHEMA = ("src_url string, format string, feed_title string, "
               "entry_id string, title string, updated timestamp, "
               "link string, error string")

_ATOM_NS = "{http://www.w3.org/2005/Atom}"


def _utc_naive(dt: datetime | None) -> datetime | None:
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _rfc3339(text: str | None) -> datetime | None:
    if not text:
        return None
    try:
        return _utc_naive(datetime.fromisoformat(text.strip()))
    except ValueError:
        return None


def _rfc822(text: str | None) -> datetime | None:
    if not text:
        return None
    try:
        return _utc_naive(parsedate_to_datetime(text.strip()))
    except (ValueError, TypeError):
        return None


def _text(el) -> str | None:
    return None if el is None or el.text is None else el.text


def _atom_link(entry, base: str) -> str | None:
    """rel=alternate preferred; first link otherwise; href resolved."""
    first = None
    for ln in entry.findall(_ATOM_NS + "link"):
        href = ln.get("href")
        if not href:
            continue
        if first is None:
            first = href
        if ln.get("rel", "alternate") == "alternate":
            return urljoin(base, href)
    return urljoin(base, first) if first else None


def parse_feed(url: str, xml: str) -> list[dict]:
    """Pure-Python twin: one feed document → FEED_SCHEMA rows."""

    def row(format=None, feed_title=None, entry_id=None, title=None,
            updated=None, link=None, error=None) -> dict:
        return {"src_url": url, "format": format,
                "feed_title": feed_title, "entry_id": entry_id,
                "title": title, "updated": updated, "link": link,
                "error": error}

    try:
        root = ET.fromstring(xml or "")
    except ET.ParseError as exc:
        return [row(error=f"xml: {exc}")]

    if root.tag == _ATOM_NS + "feed":
        ftitle = _text(root.find(_ATOM_NS + "title"))
        return [row(format="atom", feed_title=ftitle,
                    entry_id=_text(e.find(_ATOM_NS + "id")),
                    title=_text(e.find(_ATOM_NS + "title")),
                    updated=_rfc3339(_text(e.find(_ATOM_NS
                                                  + "updated"))),
                    link=_atom_link(e, url))
                for e in root.findall(_ATOM_NS + "entry")]

    if root.tag == "rss":
        channel = root.find("channel")
        if channel is None:
            return [row(error="rss: no channel element")]
        ftitle = _text(channel.find("title"))
        out = []
        for it in channel.findall("item"):
            link = _text(it.find("link"))
            link = urljoin(url, link) if link else None
            out.append(row(
                format="rss", feed_title=ftitle,
                entry_id=_text(it.find("guid")) or link,
                title=_text(it.find("title")),
                updated=_rfc822(_text(it.find("pubDate"))),
                link=link))
        return out

    return [row(error=f"unsupported root element {root.tag!r}")]


def feed_entries(feeds: DataFrame, url_col: str = "url",
                 xml_col: str = "xml") -> DataFrame:
    """feeds(url, xml) → FEED_SCHEMA entry rows — one stateless
    Arrow pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src_url", "format", "feed_title", "entry_id",
                "title", "updated", "link", "error"]
        for pdf in it:
            rows: list[dict] = []
            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                if isinstance(xml, (bytes, bytearray, memoryview)):
                    xml = bytes(xml).decode("utf-8", errors="replace")
                rows.extend(parse_feed(url, xml))
            yield pd.DataFrame(rows, columns=cols)

    return feeds.select(url_col, xml_col).mapInPandas(
        batches, schema=FEED_SCHEMA)

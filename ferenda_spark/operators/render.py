"""Publish-surface rendering (S11 / A4 tail): Atom feed documents.

The reference renders news feeds as Atom XML files per facet value
plus the union "All" feed (/root/reference/ferenda/documentrepository
.py:3524+ ``news_write_atom``: entries newest-first, RFC3339
timestamps, escaped titles, feed-level ``updated`` = newest entry).

Spark restatement: rendering is an *aggregation to one XML string
per feed* — sort-in-array + transform + concat, all JVM-side.  The
per-feed ``collect_list`` is bounded by the page-size cap the caller
applies first (the reference's paginated feeds do the same), so no
unbounded group state.  Writing each string to its file is the
trivial last step (``df.write`` partitioned by feed, or a foreach
sink in streaming) and is environment-bound, like the WSGI serving
layer the survey scoped out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ATOM_NS = "http://www.w3.org/2005/Atom"


def escape_xml(c: Column) -> Column:
    """Minimal XML text escape (order matters: & first)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def rfc3339(ts: Column) -> Column:
    """Format a UTC wall-clock timestamp as RFC3339. The input must
    already BE UTC wall-clock (TIMESTAMP_NTZ carrying UTC, or an
    instant pre-converted via ``_as_utc``) — date_format on an
    unconverted instant would print session-local time labeled 'Z'."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def _as_utc(entries: DataFrame, ts_col: str) -> Column:
    """UTC wall-clock column for ``ts_col`` regardless of session
    timezone: instants (TIMESTAMP) are converted session→UTC;
    TIMESTAMP_NTZ is UTC wall-clock by the lakehouse convention used
    throughout (warc_ts, event ts) and passes through."""
    if dict(entries.dtypes).get(ts_col) == "timestamp":
        return F.convert_timezone(None, F.lit("UTC"),
                                  F.col(ts_col).cast("timestamp_ntz"))
    return F.col(ts_col)


def atom_feeds(entries: DataFrame, feed_col: str = "feed",
               id_col: str = "entry_id", title_col: str = "title",
               ts_col: str = "ts") -> DataFrame:
    """(feed, atom_xml): one Atom document per feed, entries
    newest-first (ties: lower id first), feed ``updated`` = newest
    entry timestamp. Caller bounds entries-per-feed beforehand."""
    tsu = _as_utc(entries, ts_col)
    # cast covers TIMESTAMP_NTZ inputs (unix_micros wants TIMESTAMP)
    key = F.struct(
        (-F.unix_micros(tsu.cast("timestamp"))).alias("negus"),
        F.col(id_col).alias("id"))
    item = F.struct(key.alias("k"),
                    F.concat(
                        F.lit("<entry><id>urn:entry:"),
                        F.col(id_col).cast("string"),
                        F.lit("</id><title>"),
                        escape_xml(F.col(title_col)),
                        F.lit("</title><updated>"),
                        rfc3339(tsu),
                        F.lit("</updated></entry>")).alias("xml"))
    agg = entries.groupBy(feed_col).agg(
        F.array_sort(F.collect_list(item)).alias("items"),
        F.max(tsu).alias("_newest"))
    body = F.array_join(F.transform(F.col("items"), lambda s: s["xml"]),
                        "")
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="utf-8"?>'
              f'<feed xmlns="{ATOM_NS}"><title>'),
        escape_xml(F.col(feed_col)),
        F.lit("</title><updated>"), rfc3339(F.col("_newest")),
        F.lit("</updated>"), body, F.lit("</feed>"))
    return agg.select(F.col(feed_col).alias("feed"),
                      xml.alias("atom_xml"))

"""Crawl scheduling (S1): distributed frontier management.

The reference's ``download()`` walks seed/TOC pages and follows
discovered links one process at a time
(/root/reference/ferenda/documentrepository.py:964-1040
``download``/``download_get_basefiles``), with DocumentStore tracking
what exists.  The HTTP fetch itself is environment-bound (and out of
scope in this sandbox); what *does* restate to Spark is the
scheduler: breadth-first frontier expansion over the link graph with
a visited set, which at crawl scale (10^12 urls) must be a
distributed anti-join, not a driver-side ``set``.

``crawl_frontier`` is that scheduler: per round, join the frontier
with the link table, anti-join against everything visited, record the
round as the url's depth (= min hops from any seed, since BFS visits
each url first at its shortest distance).  Each round is one shuffle
join; frontier and visited are persisted and the previous round's
cache is dropped, so round N never recomputes rounds 1..N-1 (the
kg_closure lesson).  The per-round ``count()`` is the driver's
scheduling decision — one scalar per round, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_frontier(links: DataFrame, seeds: DataFrame,
                   max_depth: int = 3,
                   url_col: str = "url") -> DataFrame:
    """BFS reachability over ``links(src, dst)`` from ``seeds``:
    (url, depth) rows, depth = min hops from any seed, bounded by
    ``max_depth``. Stops early when a round discovers nothing."""
    links = links.select("src", "dst").persist()
    visited = (seeds.select(F.col(url_col).alias("url")).distinct()
               .withColumn("depth", F.lit(0)).persist())
    frontier = visited.select("url")
    prev_frontier = None  # the persisted nxt backing `frontier`
    for depth in range(1, max_depth + 1):
        nxt = (frontier.join(links, frontier["url"] == links["src"])
               .select(F.col("dst").alias("url")).distinct()
               .join(visited, "url", "left_anti")
               .withColumn("depth", F.lit(depth))
               .persist())
        n_new = nxt.count()  # scheduling decision; materializes nxt
        if n_new == 0:
            nxt.unpersist()
            break
        new_visited = visited.unionByName(nxt).persist()
        new_visited.count()  # materialize before dropping the parent
        visited.unpersist()
        # the previous round's frontier is fully contained in the new
        # visited set (just materialized) — safe to drop its cache now
        if prev_frontier is not None:
            prev_frontier.unpersist()
        visited = new_visited
        prev_frontier = nxt
        frontier = nxt.select("url")
    links.unpersist()
    if prev_frontier is not None:
        prev_frontier.unpersist()
    return visited


def schedule_fetches(frontier: DataFrame, delays: DataFrame = None,
                     default_delay_millis: int = 1000,
                     url_col: str = "url",
                     max_per_host: int = None,
                     broadcast_delays: bool = True) -> DataFrame:
    """Politeness scheduling: admitted frontier urls → per-host fetch
    slots.  Adds ``host``, ``fetch_seq`` (1-based position in the
    host's queue, deterministic url order) and ``not_before_millis``
    = ``(fetch_seq-1) · delay`` — the earliest offset, relative to
    the host queue's start, at which the fetch respects the host's
    crawl delay.  A wave-based executor then runs slot t =
    ``not_before_millis div wave_millis`` of every host in parallel.

    ``delays`` is :func:`~ferenda_spark.operators.robots.parse_robots`
    output (its ``crawl_delay_millis``; hosts without a record — or
    the whole argument omitted — fall back to ``default_delay_millis``,
    one polite request/second).  ``max_per_host`` caps each host's
    queue per scheduling round (the head-host guard: a 10^8-url host
    must not monopolize the round; the tail re-enters next round).

    Scale shape: the per-host sequence is a window PARTITIONED BY
    host — inherently so, politeness is a per-host total order; the
    parallelism is across the ~10^8 hosts of a web corpus, and
    ``max_per_host`` bounds the skew of any one partition.  The
    delays side is one short row per domain: broadcast by default,
    ``broadcast_delays=False`` lets AQE plan the join when the domain
    table is itself huge.  No other shuffle."""
    from pyspark.sql import Window

    from ferenda_spark.functions.web import url_host_col

    out = frontier.withColumn("host", url_host_col(F.col(url_col)))
    if delays is not None:
        d = delays.select(F.col("domain").alias("host"),
                          "crawl_delay_millis")
        if broadcast_delays:
            d = F.broadcast(d)
        out = out.join(d, "host", "left")
    else:
        out = out.withColumn("crawl_delay_millis",
                             F.lit(None).cast("long"))
    delay = F.coalesce(F.col("crawl_delay_millis"),
                       F.lit(int(default_delay_millis)))
    w = Window.partitionBy("host").orderBy(url_col)
    out = (out.withColumn("fetch_seq", F.row_number().over(w))
           .withColumn("not_before_millis",
                       (F.col("fetch_seq") - 1).cast("long") * delay)
           .drop("crawl_delay_millis"))
    if max_per_host is not None:
        out = out.filter(F.col("fetch_seq") <= int(max_per_host))
    return out

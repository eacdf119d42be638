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

"""Dependency-triggered incremental regeneration.

The reference re-generates a document when anything it DEPENDS ON
changes: ``relate_dependencies`` records, for every resolved citation
S → T, that T's generated page depends on S (T renders "referenced by
S" annotations; /root/reference/ferenda/documentrepository.py:
2015-2077, add_dependency:2055-2077), and ``needed("generate")``
compares the dependency's freshness against the generated artifact
(documentstore.py:438-457 — mtime comparison there, snapshot
provenance timestamps here).

Spark-first restatement:

* ``dependency_pairs``     — the dependency graph as (url, depends_on)
                             rows derived from the resolved citation
                             edges (one equi-join, resolve.py).
* ``stale_set``            — the transitive DEPENDENT set of a
                             changed-url frontier: seeded BFS over the
                             reversed dependency edges, NEVER an
                             all-pairs closure (at 10^12 docs the
                             all-pairs dependency closure is
                             quadratic-ish in the citation graph; the
                             reach from one day's changed set is tiny
                             and proportional to actual work).
* ``regenerate``           — the ``needed("generate")`` loop as one
                             job: changed = hash-anti-join against the
                             generate-stage provenance, stale =
                             changed ∪ their transitive dependents,
                             re-emit exactly those and commit a
                             generate provenance snapshot so the next
                             run skips them.

Cycles (A cites B cites A) terminate through the visited anti-join;
each BFS round is one shuffle on the url key and each frontier is
``localCheckpoint``-ed so the iterated plan stays O(rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.operators.graph import (
    GraphStore,
    pending_pages,
    provenance_rows,
)
from ferenda_spark.operators.resolve import resolve_citations


def dependency_pairs(edges: DataFrame, pages_uris: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """(url, depends_on) rows: ``url``'s generated output depends on
    ``depends_on`` — S citing T makes T's page depend on S, because
    T's generated output embeds the inbound-reference annotation
    (annotations.rq:14-18; add_dependency's direction,
    documentrepository.py:2055-2077).  Self-citations collapse (a doc
    trivially depends on itself through its own hash)."""
    resolved = resolve_citations(edges, pages_uris, url_col)
    return (resolved.filter(F.col("target_url").isNotNull())
            .select(F.col("target_url").alias("url"),
                    F.regexp_replace("subj", r"#.*$", "")
                    .alias("depends_on"))
            .filter(F.col("url") != F.col("depends_on"))
            .distinct())


def stale_set(dep_pairs: DataFrame, changed: DataFrame,
              max_depth: int | None = None,
              url_col: str = "url") -> DataFrame:
    """(url, depth) rows: every document whose generated output is
    stale given the ``changed`` urls — the changed documents
    themselves at depth 0, direct dependents at 1, and so on
    transitively (a regenerated page changes ITS rendered output,
    which other pages may embed in turn).

    ``max_depth=None`` (default) iterates to fixpoint; a bound stays
    available when the product contract caps cascade depth.  Seeded
    BFS: each round joins the frontier against the reversed dependency
    edges, anti-joins the visited set (cycle-safe, no re-derivation),
    and ``localCheckpoint``s the new frontier so the loop's plan never
    nests.  depth is the minimum dependency distance from any changed
    doc (BFS discovery order makes that free).
    """
    from functools import reduce

    from pyspark import StorageLevel

    # pin the reversed edge set ONCE: dep_pairs usually carries the
    # full extract→resolve lineage, and every BFS round joins against
    # rev — unpinned, that lineage would re-run once per round (the
    # whole-corpus extract times the cascade depth)
    rev = (dep_pairs.select(F.col("depends_on").alias("src"),
                            F.col("url").alias("dst"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    seed = (changed.select(F.col(url_col).alias("url")).distinct()
            .withColumn("depth", F.lit(0))
            .localCheckpoint())
    # parts-list shape (same as analytics._closure_fixpoint): only the
    # NEW frontier is materialized each round; `visited` stays a flat
    # union of already-checkpointed leaves.  Re-checkpointing the whole
    # visited set per round would rewrite O(|visited| · depth) rows to
    # executor storage on a deep cascade.
    parts = [seed]
    frontier = seed.select("url")
    d = 0
    while max_depth is None or d < max_depth:
        d += 1
        if d > 10_000:          # |urls| rounds at most; this is a bug
            raise RuntimeError("stale_set: BFS did not converge "
                               "(visited anti-join broken?)")
        visited = reduce(DataFrame.unionByName, parts)
        nxt = (frontier.join(rev, frontier["url"] == rev["src"])
               .select(F.col("dst").alias("url")).distinct()
               .join(visited, "url", "left_anti")
               .withColumn("depth", F.lit(d))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        parts.append(nxt)
        frontier = nxt.select("url")
    # parts are checkpointed leaves — the result never references rev,
    # so release the cache here instead of leaking it on a long-lived
    # driver (the gate runner / serving CLI)
    rev.unpersist()
    return reduce(DataFrame.unionByName, parts)


def regenerate(spark: SparkSession, pages: DataFrame, store: GraphStore,
               stage: str = "generate",
               max_depth: int | None = None,
               emit=None) -> dict:
    """One incremental ``needed("generate")`` pass, committed.

    1. changed  = pages new/edited since the last ``stage`` snapshot
                  (hash anti-join — pending_pages, the S2 change
                  detector).
    2. stale    = changed ∪ transitive dependents over the CURRENT
                  committed edge graph (read_current: the
                  provenance-gated latest-version view).
    3. re-emit  = exactly the stale pages through ``emit`` (a render
                  sink: emit(todo_pages, stale_urls)); THEN a generate
                  provenance row per url commits the pass so an
                  immediate rerun is a no-op.

    Commit ordering is the crash contract: the provenance append is
    LAST, after ``emit`` returns — a crash inside the sink (or between
    the stale computation and the sink) leaves no provenance, so a
    replay regenerates the same set deterministically.  Committing
    first would mark pages generated forever while no artifact exists.
    With ``emit=None`` the provenance commit itself is the pass's
    artifact (the caller only wants the work-list bookkeeping, e.g.
    the streaming maintainer whose rendered outputs are downstream
    consumers of the returned urls).

    Returns ``{"changed": n, "regenerated": n, "urls": DataFrame}``;
    the urls DataFrame ((url, depth), localCheckpointed) is what a
    render sink consumes — render.xhtml pages / atom feeds.
    """
    import time as _time

    t0 = _time.time()
    changed = pending_pages(pages, store, stage).persist()
    n_changed = changed.count()
    if n_changed == 0:
        changed.unpersist()
        return {"changed": 0, "regenerated": 0, "skipped": True,
                "urls": None}
    deps = (dependency_pairs(store.read_current("edge"),
                             pages.select("url"))
            if store.exists("edge") else
            changed.select("url").limit(0)
            .select(F.col("url"),
                    F.col("url").alias("depends_on")))
    stale = stale_set(deps, changed.select("url"), max_depth=max_depth)
    todo = (pages.join(stale, "url", "left_semi"))
    if emit is not None:
        emit(todo, stale)
    prov = provenance_rows(todo, stage,
                           duration_s=_time.time() - t0)
    store.append(prov, "provenance")
    n_stale = stale.count()
    changed.unpersist()
    return {"changed": n_changed, "regenerated": n_stale,
            "skipped": False, "urls": stale}

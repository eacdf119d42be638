"""Structured Streaming ingest for the KG pipeline.

The reference is batch-only; its incremental devices (``lastdownload``
crawl gating, ``needed()`` mtime freshness, dependency-triggered
regeneration — /root/reference/ferenda/decorators.py:67-80,
documentstore.py:400-470) map onto Structured Streaming as:

* source offset / watermark on ``warc_ts``  ← lastdownload gating
* per-micro-batch idempotent MERGE          ← needed() freshness
* snapshot retention in the GraphStore      ← archive of versions

``stream_pipeline`` runs the SAME batch transforms per micro-batch via
``foreachBatch`` — one code path for batch and streaming (the Spark
idiom), with the GraphStore anti-join making replays idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.operators.graph import GraphStore
from ferenda_spark.pipeline import run_pipeline

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def read_page_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of page parquet drops (a stand-in for a
    Kafka/WARC feed; same DataFrame downstream either way)."""
    return (spark.readStream
            .schema(PAGES_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_pipeline(spark: SparkSession, pages_stream: DataFrame,
                    entities: DataFrame, store: GraphStore,
                    checkpoint_dir: str):
    """Incremental KG construction: each micro-batch runs the batch
    pipeline. Delivery semantics, precisely: the store's
    (url, input_hash) anti-join makes a COMPLETED batch's redelivery
    a no-op, and the three table appends inside a batch are NOT
    atomic — a crash between the edge append and the provenance
    append leaves an orphan edge snapshot that a replay recomputes.
    Appends are therefore at-least-once; ``GraphStore.read_current``
    (provenance-gated latest-version view) is what restores an
    exactly-once OBSERVED graph, which is the contract consumers
    get."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        run_pipeline(spark, batch_df, entities, store)

    return (pages_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded — the 100 TB-stream
    essential). Batch-equivalent: the streaming_hourly_events query."""
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "total_value"))


def _latest_pages(store: GraphStore) -> DataFrame:
    """Latest version of every url in the versioned ``page`` table:
    one map-side-combinable max(struct) keyed on the monotone
    ingest_seq — no window, no global sort."""
    pg = store.read("page")
    rest = [c for c in pg.columns if c not in ("url", "ingest_seq")]
    return (pg.groupBy("url")
            .agg(F.max(F.struct("ingest_seq", *rest)).alias("s"))
            .select("url", *[F.col(f"s.{c}").alias(c) for c in rest]))


def stream_pipeline_with_regen(spark: SparkSession,
                               pages_stream: DataFrame,
                               entities: DataFrame, store: GraphStore,
                               checkpoint_dir: str,
                               max_depth: int | None = None):
    """Streaming incremental KG maintenance — the reference's
    dependency-triggered regeneration loop (``add_dependency``,
    documentrepository.py:2055-2077 → ``needed("generate")``,
    documentstore.py:438-457) made continuous.  Each micro-batch:

    1. ingest: ``run_pipeline`` processes the batch idempotently
       (hash anti-join; replays are no-ops);
    2. version the page snapshot into a ``page`` table (monotone
       ``ingest_seq`` = batch id, so the latest version per url is a
       max(struct) — the corpus regenerate reads);
    3. regenerate EXACTLY the batch's changed pages plus their
       transitive dependents over the just-updated edge graph
       (``regen.regenerate``), committing generate-stage provenance
       so an unchanged redelivery regenerates nothing.

    A page never delivered again still regenerates when a NEW citing
    page arrives: the new page is the changed frontier and the cited
    page is its dependent — the inbound-reference annotation freshness
    the reference maintains through dependency files."""
    from ferenda_spark.operators.graph import with_input_hash
    from ferenda_spark.operators.regen import regenerate

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        if batch.isEmpty():
            return
        run_pipeline(spark, batch, entities, store)
        store.append(
            with_input_hash(batch).withColumn(
                "ingest_seq", F.lit(batch_id).cast("long")),
            "page")
        regenerate(spark, _latest_pages(store), store,
                   stage="generate", max_depth=max_depth)

    return (pages_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())

def stream_materialize_entailed(spark: SparkSession,
                                triples_stream: DataFrame,
                                schema: DataFrame, store: GraphStore,
                                checkpoint_dir: str,
                                table: str = "entailed"):
    """Continuous RDFS materialization: every micro-batch of instance
    triples is forward-chained against a STATIC TBox and appended to
    the entailed graph table.

    Why per-batch entailment is complete (no streaming state): each
    ρdf instance rule (rdfs7/2/3/9 — operators/infer.py) derives from
    ONE instance triple plus the closed schema, so a triple's
    entailments ride in whatever batch carries it; no cross-batch
    joins.  The TBox closure (the only fixpoint) is computed ONCE at
    stream start and ``localCheckpoint``-pinned, so per-batch plans
    join materialized leaves instead of re-running it.

    Delivery: snapshot appends are at-least-once (a batch replayed
    after a mid-append crash appends again), but materialization is
    deterministic and row-idempotent, so the exactly-once OBSERVED
    graph is ``store.read(table).dropDuplicates(["subj", "pred",
    "obj"])`` — replayed rows are byte-identical.  ``batch_seq``
    records which micro-batch produced each snapshot for lineage.
    The closed TBox's own triples are NOT re-emitted per batch; the
    schema owner holds them (union :class:`ClosedSchema`
    ``.triples`` at read when the consumer wants the full graph).
    """
    from ferenda_spark.operators.infer import (
        close_schema,
        rdfs_materialize,
    )
    closed = close_schema(schema, checkpoint=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        if batch.isEmpty():
            return
        mat = rdfs_materialize(batch, closed=closed)
        store.append(
            mat.withColumn("batch_seq", F.lit(batch_id).cast("long")),
            table)

    return (triples_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_decontaminate(spark: SparkSession, docs_stream: DataFrame,
                         bench: DataFrame, store: GraphStore,
                         checkpoint_dir: str,
                         table: str = "contamination",
                         text_col: str = "text",
                         id_col: str = "doc_id", n: int = 13):
    """Daily-crawl decontamination as a stream: the benchmark's Bloom
    filter is built ONCE (driver-side word collect, broadcast) and
    every micro-batch probes the same filter map-side — the per-batch
    cost is one Arrow probe over the batch's shingles plus the exact
    verify join on its survivor trickle, never a rebuild of the
    benchmark side.  One row per (doc, batch) appended with
    ``batch_seq`` lineage.

    Delivery: appends are at-least-once, but the report is
    deterministic and row-idempotent, so the exactly-once OBSERVED
    report is ``store.read(table).dropDuplicates(["id"])`` — replayed
    rows are byte-identical (same contract as the RDFS maintainer
    above)."""
    from ferenda_spark.operators.dedup import (
        build_shingle_bloom,
        decontaminate_bloom,
    )
    bloom = build_shingle_bloom(bench, text_col=text_col, n=n)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        if batch.isEmpty():
            return
        rep = decontaminate_bloom(batch, bench, bloom=bloom,
                                  text_col=text_col, id_col=id_col,
                                  bench_text_col=text_col, n=n)
        store.append(
            rep.withColumn("batch_seq", F.lit(batch_id).cast("long")),
            table)

    return (docs_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_feed_stream(spark: SparkSession, path: str,
                     max_files: int = 64) -> DataFrame:
    """Streaming source over a directory of polled feed snapshots —
    parquet files of (url, xml) rows, one file per poll drop (the
    shape a fetcher fleet lands)."""
    return (spark.readStream
            .schema("url string, xml string")
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def stream_feed_discovery(spark: SparkSession, feeds_stream: DataFrame,
                          store: "GraphStore", checkpoint_dir: str,
                          table: str = "frontier_candidates"):
    """Continuous crawl discovery from polled feeds: each micro-batch
    of fetched feed documents parses through sources/feeds.py (Atom +
    RSS), entry links become frontier candidates, and ONLY
    first-ever-seen urls are appended — re-polling a feed whose
    entries haven't changed appends nothing, so the frontier table
    stays proportional to genuinely new content, not to poll
    frequency.

    First-seen is decided against the STORE (left-anti join on the
    already-appended url set), not per-batch state: the store is the
    durable dedup ledger, surviving checkpoint resets, and the
    anti-join's build side is the frontier table itself — bounded by
    discovered-url count.  Appends carry ``batch_seq`` + the feed
    provenance; parse-error rows are appended to ``<table>_errors``
    (loud, never dropped).

    Retry-idempotent: ``foreachBatch`` is at-least-once, so a
    micro-batch can replay after a mid-process failure.  Each append
    records ``batch_seq``, and the batch body skips any arm (errors,
    frontier) whose ``batch_seq`` is already committed — appends are
    manifest-atomic (GraphStore.append commits under a lock), so a
    recorded batch_seq means that arm landed COMPLETELY and a replay
    must append nothing for it.  The batch-parity contract: after
    any sequence of drops, including replays, ``store.read(table)``
    equals the one-shot batch parse of all drops deduped to first
    occurrence."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _feed_discovery_batch(store, table, batch_df, batch_id)

    return (feeds_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def _batch_committed(store: "GraphStore", table: str,
                     batch_id: int) -> bool:
    """True iff an append tagged ``batch_seq == batch_id`` is already
    committed to ``table`` — the replay ledger for at-least-once
    foreachBatch (appends are manifest-atomic, so presence means the
    whole arm landed)."""
    if not store.exists(table):
        return False
    return not (store.read(table)
                .filter(F.col("batch_seq") == batch_id).isEmpty())


def _feed_discovery_batch(store: "GraphStore", table: str,
                          batch_df: DataFrame, batch_id: int) -> None:
    """One micro-batch of stream_feed_discovery, replay-safe: each
    arm is skipped when its batch_seq is already committed, so
    calling this twice with the same (batch_df, batch_id) — Spark's
    at-least-once retry — appends nothing the second time."""
    from ferenda_spark.sources.feeds import feed_entries

    batch = batch_df.localCheckpoint()
    if batch.isEmpty():
        return
    err_done = _batch_committed(store, table + "_errors", batch_id)
    cand_done = _batch_committed(store, table, batch_id)
    if err_done and cand_done:
        return
    ent = feed_entries(batch).localCheckpoint()
    if not err_done:
        errs = ent.filter(F.col("error").isNotNull())
        if not errs.isEmpty():
            store.append(
                errs.select("src_url", "error")
                .withColumn("batch_seq", F.lit(batch_id).cast("long")),
                table + "_errors")
    if not cand_done:
        cand = (ent.filter(F.col("error").isNull()
                           & F.col("link").isNotNull())
                .groupBy(F.col("link").alias("url"))
                .agg(F.min("src_url").alias("via_feed"),
                     F.min("entry_id").alias("via_entry")))
        if store.exists(table):
            seen = store.read(table).select("url").distinct()
            cand = cand.join(seen, "url", "left_anti")
        store.append(
            cand.withColumn("batch_seq", F.lit(batch_id).cast("long")),
            table)

"""Structured Streaming ingest tests: incremental KG construction via
foreachBatch (idempotent under redelivery) and watermarked windowed
aggregation."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import entities_df, pages_df
from ferenda_spark.operators.graph import GraphStore
from ferenda_spark.streaming.ingest import (
    read_page_stream,
    stream_pipeline,
    windowed_event_counts,
)


def test_stream_pipeline_incremental(spark, tmp_path):
    pages = pages_df(spark, 12, partitions=2).persist()
    ents = entities_df(spark)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, str(tmp_path / "graph"))

    # drop 1: first half of the corpus
    pages.filter(F.regexp_extract("url", r"(\d+)$", 1).cast("int") <= 6
                 ).write.mode("append").parquet(in_dir)
    q = stream_pipeline(spark, read_page_stream(spark, in_dir), ents,
                        store, ckpt)
    q.awaitTermination(120)
    n1 = store.read("edge").count()
    assert n1 > 0

    # drop 2: full corpus re-delivered (first half is a replay)
    pages.write.mode("append").parquet(in_dir)
    q = stream_pipeline(spark, read_page_stream(spark, in_dir), ents,
                        store, ckpt)
    q.awaitTermination(120)
    n2 = store.read("edge").count()

    # batch reference: one-shot run over the full corpus
    from ferenda_spark.pipeline import build_triples
    expected = build_triples(pages, ents).count()
    assert n2 == expected

    # replay drop: nothing new → edge table unchanged
    pages.limit(3).write.mode("append").parquet(in_dir)
    q = stream_pipeline(spark, read_page_stream(spark, in_dir), ents,
                        store, ckpt)
    q.awaitTermination(120)
    assert store.read("edge").count() == n2
    pages.unpersist()


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    batch = spark.range(0, 100).select(
        F.timestamp_seconds(1704067200 + F.col("id") * 180).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"))
    src = str(tmp_path / "events")
    batch.write.parquet(src)

    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .parquet(src))
    q = (windowed_event_counts(stream)
         .writeStream.format("memory").queryName("win_agg")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(str(r["window_start"]), r["event_type"]): (r["n"],
                                                       r["total_value"])
           for r in spark.sql("select * from win_agg").collect()}
    want = {(str(r["ws"]), r["event_type"]): (r["n"], r["total_value"])
            for r in batch.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("ws"), "event_type", "n",
                    "total_value").collect()}
    # append mode emits only windows closed by the watermark; all
    # emitted windows must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_stateful_sessions(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap-split on arrival,
    watermark-timeout close, and agreement with batch session
    boundaries."""
    from ferenda_spark.streaming.state import stateful_sessions

    src = str(tmp_path / "sess_in")
    ckpt = str(tmp_path / "sess_ckpt")

    def drop(rows, name):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1).write.mode("append").parquet(src)

    t0 = 1704067200  # 2024-01-01 00:00 UTC
    drop([(1, _ts(t0)), (1, _ts(t0 + 600)), (2, _ts(t0))], "f1")
    # u1's 2nd session starts 2h later (closes session 1 via gap);
    # flusher user 99 pushes the watermark forward
    drop([(1, _ts(t0 + 7200)), (99, _ts(t0 + 50000))], "f2")
    # final flush advances the watermark past every open session
    drop([(99, _ts(t0 + 90000))], "f3")

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "0 seconds"))
    out = stateful_sessions(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sessions_out")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["user_id"], r["session_start"].timestamp(),
            r["session_end"].timestamp(), r["n_events"])
           for r in spark.sql(
               "SELECT * FROM sessions_out WHERE user_id < 90").collect()}
    assert (1, t0, t0 + 600, 2) in got          # u1 session 1 (gap-closed)
    assert (2, t0, t0, 1) in got                # u2 (timeout-closed)
    assert (1, t0 + 7200, t0 + 7200, 1) in got  # u1 session 2 (timeout)
    assert len(got) == 3


def test_stateful_sessions_out_of_order_gap_split(spark, tmp_path):
    """An in-watermark event that arrives LATER but is timestamped
    more than a gap BEFORE the open session must form its own
    session — the single-open-session scheme used to merge it,
    bridging a silence longer than the gap (a batch-parity break)."""
    from ferenda_spark.streaming.state import stateful_sessions

    src = str(tmp_path / "ooo_in")
    ckpt = str(tmp_path / "ooo_ckpt")

    def drop(rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1).write.mode("append").parquet(src)

    t0 = 1704067200
    drop([(1, _ts(t0 + 3600))])            # batch 1: later event first
    drop([(1, _ts(t0))])                   # batch 2: one hour EARLIER
    drop([(99, _ts(t0 + 90000))])          # flusher: seals everything

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "2 hours"))
    out = stateful_sessions(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("ooo_sessions")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["session_start"].timestamp(), r["session_end"].timestamp(),
            r["n_events"])
           for r in spark.sql(
               "SELECT * FROM ooo_sessions WHERE user_id = 1").collect()}
    # batch semantics: two sessions separated by the 1h silence
    assert got == {(t0, t0, 1), (t0 + 3600, t0 + 3600, 1)}


def _ts(epoch):
    import datetime
    return datetime.datetime.fromtimestamp(
        epoch, datetime.timezone.utc).replace(tzinfo=None)


def test_stream_regen_exact_dependent_set(spark, tmp_path):
    """Streaming dependency-triggered regeneration: touching ONE page
    (content-hash change only — an HTML comment, so its triples are
    identical) regenerates precisely that page plus its transitive
    dependents over the dependency graph, and nothing else.  The
    expected dependent set is computed INDEPENDENTLY: a pure-Python
    BFS over the collected dependency pairs."""
    from ferenda_spark.operators.regen import dependency_pairs
    from ferenda_spark.streaming.ingest import stream_pipeline_with_regen

    pages = pages_df(spark, 12, partitions=2).persist()
    ents = entities_df(spark)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, str(tmp_path / "graph"))

    pages.write.mode("append").parquet(in_dir)
    q = stream_pipeline_with_regen(
        spark, read_page_stream(spark, in_dir), ents, store, ckpt)
    q.awaitTermination(180)

    gen = (store.read("provenance")
           .filter(F.col("stage") == "generate"))
    before = {r["url"]: r["n"] for r in
              gen.groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert set(before) == {r["url"] for r in
                           pages.select("url").collect()}  # full first pass

    # touch one page: hash changes, emitted triples do not
    touched_url = sorted(before)[3]
    touched = (pages.filter(F.col("url") == touched_url)
               .withColumn("html", F.concat(F.col("html"),
                                            F.lit(b"<!-- touched -->"))))
    touched.write.mode("append").parquet(in_dir)
    q = stream_pipeline_with_regen(
        spark, read_page_stream(spark, in_dir), ents, store, ckpt)
    q.awaitTermination(180)

    after = {r["url"]: r["n"] for r in
             (store.read("provenance")
              .filter(F.col("stage") == "generate")
              .groupBy("url").agg(F.count("*").alias("n")).collect())}
    regenerated = {u for u, n in after.items() if n > before.get(u, 0)}

    # independent expectation: python BFS over the dependency pairs
    dep = dependency_pairs(store.read_current("edge"),
                           pages.select("url")).collect()
    fwd = {}
    for r in dep:
        fwd.setdefault(r["depends_on"], set()).add(r["url"])
    expected, frontier = {touched_url}, {touched_url}
    while frontier:
        nxt = set().union(*(fwd.get(u, set()) for u in frontier)) - expected
        expected |= nxt
        frontier = nxt
    assert expected - {touched_url}          # the fixture HAS dependents
    assert regenerated == expected
    pages.unpersist()


def test_stream_materialize_entailed_matches_batch(spark, tmp_path):
    """Two micro-batch drops of instance triples must materialize, in
    union, EXACTLY the batch rdfs_materialize over the whole corpus
    (minus the TBox triples, which the stream contract leaves with
    the schema owner) — per-batch ρdf entailment loses nothing."""
    from ferenda_spark.operators import infer
    from ferenda_spark.operators.infer import rdfs_materialize
    from ferenda_spark.streaming.ingest import stream_materialize_entailed

    schema = spark.createDataFrame([
        ("c:A", infer.SUBCLASS, "c:B"),
        ("p:p", infer.SUBPROP, "p:q"),
        ("p:q", infer.DOMAIN, "c:A"),
    ], "subj string, pred string, obj string")
    inst_rows = [(f"s{i}", "p:p", f"o{i}") for i in range(8)] + \
        [(f"s{i}", infer.RDF_TYPE, "c:A") for i in range(3)]
    inst = spark.createDataFrame(inst_rows,
                                 "subj string, pred string, obj string")

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, str(tmp_path / "graph"))

    # drop 1: first half
    inst.filter(F.col("subj").isin("s0", "s1", "s2", "s3")) \
        .write.mode("append").parquet(in_dir)
    stream = (spark.readStream
              .schema("subj string, pred string, obj string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = stream_materialize_entailed(spark, stream, schema, store, ckpt)
    q.awaitTermination(120)
    n1 = store.read("entailed").count()
    assert n1 > 0

    # drop 2: the rest — resumes from the checkpoint, batch 1 not redone
    inst.filter(~F.col("subj").isin("s0", "s1", "s2", "s3")) \
        .write.mode("append").parquet(in_dir)
    stream = (spark.readStream
              .schema("subj string, pred string, obj string")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = stream_materialize_entailed(spark, stream, schema, store, ckpt)
    q.awaitTermination(120)

    got = {(r["subj"], r["pred"], r["obj"]) for r in
           store.read("entailed").collect()}
    want = {tuple(r) for r in
            rdfs_materialize(inst, schema=schema).collect()}
    tbox = {tuple(r) for r in schema.collect()} | \
        {(r["subj"], r["pred"], r["obj"]) for r in
         rdfs_materialize(schema).collect()}
    assert got == want - tbox
    # every snapshot row carries its producing micro-batch
    seqs = {r["batch_seq"] for r in
            store.read("entailed").select("batch_seq").collect()}
    assert len(seqs) >= 2 and all(s is not None for s in seqs)


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Two micro-batch drops of corpus docs probed against ONE
    prebuilt benchmark Bloom must report, in union, exactly the
    batch decontaminate over the whole corpus; the checkpoint
    resumes drop 2 without redoing drop 1."""
    from ferenda_spark.operators import dedup
    from ferenda_spark.streaming.ingest import stream_decontaminate

    gram = "one two three four five six seven eight nine ten " \
           "eleven twelve thirteen"
    rows = [(1, "lead " + gram + " tail"),
            (2, "clean words without overlap " * 6),
            (3, gram + " again here with more following words"),
            (4, "another clean document entirely " * 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([("q " + gram + " a",)],
                                  "text string")

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, str(tmp_path / "graph"))

    docs.filter(F.col("doc_id") <= 2).write.mode("append").parquet(in_dir)
    mk = lambda: (spark.readStream
                  .schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = stream_decontaminate(spark, mk(), bench, store, ckpt)
    q.awaitTermination(120)
    assert store.read("contamination").count() == 2

    docs.filter(F.col("doc_id") > 2).write.mode("append").parquet(in_dir)
    q = stream_decontaminate(spark, mk(), bench, store, ckpt)
    q.awaitTermination(120)

    got = {(r["id"], r["n_hits"], r["contaminated"]) for r in
           store.read("contamination")
           .dropDuplicates(["id"]).collect()}
    want = {tuple(r) for r in
            dedup.decontaminate(docs, bench, n=13).collect()}
    assert got == want
    assert {i for i, _, c in got if c} == {1, 3}


def test_stateful_first_seen_batch_parity_under_reorder(spark, tmp_path):
    """Streaming first-occurrence dedup must pick the MIN event time
    (the batch exact-dedup winner) even when a smaller-ts event
    arrives in a LATER microbatch — the arrival-order built-in would
    pick the wrong capture."""
    from ferenda_spark.streaming.state import stateful_first_seen

    src = str(tmp_path / "fs_in")
    ckpt = str(tmp_path / "fs_ckpt")

    def drop(rows):
        spark.createDataFrame(rows, "key string, ts timestamp").coalesce(
            1).write.mode("append").parquet(src)

    t0 = 1704067200
    # batch 1: url A at t0+300 (NOT its true first), B at t0
    drop([("A", _ts(t0 + 300)), ("B", _ts(t0))])
    # batch 2: A's EARLIER capture (legal: watermark is 10 min) +
    # duplicates of both
    drop([("A", _ts(t0 + 60)), ("A", _ts(t0 + 500)),
          ("B", _ts(t0 + 120))])
    # flusher key pushes the watermark far past everything
    drop([("Z", _ts(t0 + 90000))])

    stream = (spark.readStream.schema("key string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "10 minutes"))
    out = stateful_first_seen(stream, horizon_minutes=60)
    q = (out.writeStream.format("memory").queryName("first_seen")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["key"], r["first_ts"].timestamp())
           for r in spark.sql(
               "SELECT * FROM first_seen WHERE key <> 'Z'").collect()}
    # one row per key, carrying the MINIMUM ts across batches
    assert got == {("A", t0 + 60), ("B", t0)}


def test_stream_feed_discovery_first_seen_parity(spark, tmp_path):
    """Polled feeds → frontier candidates: re-polls append nothing,
    new entries append exactly once, parse errors land loudly in the
    sidecar table, and the final frontier equals the one-shot batch
    parse deduped to first occurrence."""
    from ferenda_spark.sources.feeds import feed_entries
    from ferenda_spark.streaming.ingest import (read_feed_stream,
                                                stream_feed_discovery)

    def atom(feed, entries):
        body = "".join(
            f"<entry><id>urn:e:{i}</id><title>t{i}</title>"
            f'<link href="https://s.example/a/{i}"/>'
            f"<updated>2024-01-0{d}T00:00:00Z</updated></entry>"
            for i, d in entries)
        return (f'<feed xmlns="http://www.w3.org/2005/Atom">'
                f"<title>{feed}</title>{body}</feed>")

    in_dir = str(tmp_path / "polls")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, str(tmp_path / "graph"))

    # poll 1: two feeds, three urls, one broken document
    drop1 = [("https://h1/feed", atom("f1", [(1, 1), (2, 1)])),
             ("https://h2/feed", atom("f2", [(3, 1)])),
             ("https://bad/feed", "not xml <")]
    spark.createDataFrame(drop1, "url string, xml string") \
        .write.mode("append").parquet(in_dir)
    q = stream_feed_discovery(spark, read_feed_stream(spark, in_dir),
                              store, ckpt)
    q.awaitTermination(120)
    t = store.read("frontier_candidates")
    assert t.count() == 3
    assert store.read("frontier_candidates_errors").count() == 1

    # poll 2: feed 1 unchanged (pure re-poll), feed 2 gains one entry
    drop2 = [("https://h1/feed", atom("f1", [(1, 1), (2, 1)])),
             ("https://h2/feed", atom("f2", [(3, 1), (4, 2)]))]
    spark.createDataFrame(drop2, "url string, xml string") \
        .write.mode("append").parquet(in_dir)
    q = stream_feed_discovery(spark, read_feed_stream(spark, in_dir),
                              store, ckpt)
    q.awaitTermination(120)
    rows = store.read("frontier_candidates").collect()
    assert len(rows) == 4                       # only url 4 is new
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://s.example/a/4"]["batch_seq"] == 1

    # batch parity: one-shot parse of all drops, first occurrence
    all_feeds = spark.createDataFrame(drop1 + drop2,
                                      "url string, xml string")
    batch_urls = {r["link"] for r in feed_entries(
        all_feeds, xml_col="xml").collect()
        if r["error"] is None and r["link"]}
    assert {r["url"] for r in rows} == batch_urls


def test_stream_feed_discovery_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME micro-batch
    body with the same batch_id (a Spark retry) must append nothing —
    neither duplicate error rows nor duplicate frontier rows."""
    from ferenda_spark.streaming.ingest import _feed_discovery_batch

    store = GraphStore(spark, str(tmp_path / "graph"))
    feed = ('<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
            '<entry><id>urn:e:1</id><title>t</title>'
            '<link href="https://s.example/a/1"/>'
            '<updated>2024-01-01T00:00:00Z</updated></entry></feed>')
    batch = spark.createDataFrame(
        [("https://h1/feed", feed), ("https://bad/feed", "not xml <")],
        "url string, xml string")

    _feed_discovery_batch(store, "frontier_candidates", batch, 0)
    assert store.read("frontier_candidates").count() == 1
    assert store.read("frontier_candidates_errors").count() == 1

    # full replay of batch 0 — the pre-ADVICE-fix behavior appended
    # the error row a second time unconditionally
    _feed_discovery_batch(store, "frontier_candidates", batch, 0)
    assert store.read("frontier_candidates").count() == 1
    assert store.read("frontier_candidates_errors").count() == 1

    # replay where only the ERRORS arm committed before the failure:
    # simulate by a fresh store with just the errors append recorded
    store2 = GraphStore(spark, str(tmp_path / "graph2"))
    store2.append(
        store.read("frontier_candidates_errors"),
        "frontier_candidates_errors")
    _feed_discovery_batch(store2, "frontier_candidates", batch, 0)
    assert store2.read("frontier_candidates").count() == 1
    assert store2.read("frontier_candidates_errors").count() == 1

    # a genuinely new batch with a new id still appends
    batch2 = spark.createDataFrame(
        [("https://h1/feed", feed.replace("a/1", "a/2")
          .replace("urn:e:1", "urn:e:2"))],
        "url string, xml string")
    _feed_discovery_batch(store, "frontier_candidates", batch2, 1)
    assert store.read("frontier_candidates").count() == 2

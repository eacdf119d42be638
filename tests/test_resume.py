"""Snapshot resume: rerun is a no-op; partial rollback reprocesses
only missing urls; final edge set equals the single-run result."""

from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import entities_df, pages_df
from ferenda_spark.operators.graph import GraphStore, pending_pages
from ferenda_spark.pipeline import run_pipeline

N = 40


def _edge_set(store):
    return {tuple(r) for r in
            store.read("edge").select("subj", "pred", "obj").collect()}


def test_rerun_is_noop(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)

    first = run_pipeline(spark, pages, ents, store)
    assert first["pages"] == N and first["triples"] > 0
    single_run_edges = _edge_set(store)

    second = run_pipeline(spark, pages, ents, store)
    assert second["skipped"] is True
    assert _edge_set(store) == single_run_edges


def test_changed_pages_reprocess(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)
    run_pipeline(spark, pages, ents, store)

    # mutate one page's html → exactly that url becomes pending
    changed = pages.withColumn(
        "html",
        F.when(F.col("url").endswith("/rfc/3"),
               F.concat(F.col("html"), F.lit(b" ")))
        .otherwise(F.col("html")))
    todo = pending_pages(changed, store)
    assert [r["url"] for r in todo.select("url").collect()] == \
        ["https://example.org/res/rfc/3"]


def test_resume_after_partial_commit(spark, tmp_path):
    """Run half, then run full input — second run only does the rest,
    and the final edges equal a from-scratch single run."""
    ents = entities_df(spark)
    pages = pages_df(spark, N, partitions=2)

    full_store = GraphStore(spark, str(tmp_path / "full"))
    run_pipeline(spark, pages, ents, full_store)
    want = _edge_set(full_store)

    part_store = GraphStore(spark, str(tmp_path / "part"))
    half = pages.filter(F.md5("url").rlike("^[0-7]"))
    n_half = half.count()
    run_pipeline(spark, half, ents, part_store)
    stats = run_pipeline(spark, pages, ents, part_store)
    assert stats["pages"] == N - n_half
    assert _edge_set(part_store) == want


def test_compaction_preserves_contents_and_resume(spark, tmp_path):
    """compact() rewrites N append snapshots into one; table contents
    are row-identical, the manifest holds a single snapshot, and a
    rerun after compaction is still a no-op (resume state lives in
    the rows, not the file layout)."""
    import glob as _glob
    ents = entities_df(spark)
    pages = pages_df(spark, N, partitions=2)
    store = GraphStore(spark, str(tmp_path / "g"))
    half = pages.filter(F.md5("url").rlike("^[0-7]"))
    run_pipeline(spark, half, ents, store)
    run_pipeline(spark, pages, ents, store)      # 2 append snapshots
    assert len(store.snapshots("edge")) == 2
    before = _edge_set(store)

    store.compact("edge", target_partitions=2)
    snaps = store.snapshots("edge")
    assert len(snaps) == 1 and snaps[0]["compacted"]
    assert _edge_set(store) == before
    files = _glob.glob(str(tmp_path / "g" / "edge" / snaps[0]["id"]
                           ) + "/*.parquet")
    assert len(files) <= 2

    # old snapshot dirs survive until vacuum (reader grace period),
    # then are reclaimed without changing table contents
    edge_dir = tmp_path / "g" / "edge"
    n_dirs_before = len([p for p in edge_dir.iterdir() if p.is_dir()])
    assert n_dirs_before == 3                    # 2 old + 1 compacted
    # with the default orphan grace, freshly-written dirs are kept
    assert store.vacuum("edge") == []
    removed = store.vacuum("edge", orphan_grace_s=0)
    assert len(removed) == 2
    assert _edge_set(store) == before

    stats = run_pipeline(spark, pages, ents, store)
    assert stats["skipped"] is True              # resume unaffected


def test_compaction_merges_concurrent_append(spark, tmp_path):
    """A snapshot appended while the rewrite runs must survive the
    compaction commit (validate-and-merge, not blind replacement)."""
    store = GraphStore(spark, str(tmp_path / "g"))
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")
    late = spark.createDataFrame([(3, "c")], "k long, v string")
    store.append(df1, "t")
    store.append(df2, "t")

    # simulate an append landing mid-rewrite: hook the manifest read
    # compact() does at start so the 'concurrent' append commits
    # after compact captured its rewrite set
    orig = store._read_manifest
    fired = {"done": False}

    def read_with_concurrent_append(table):
        snaps = orig(table)
        if not fired["done"]:
            fired["done"] = True
            store.append(late, "t")   # concurrent writer
        return snaps

    store._read_manifest = read_with_concurrent_append
    try:
        store.compact("t", target_partitions=1)
    finally:
        store._read_manifest = orig

    snaps = store.snapshots("t")
    assert snaps[0].get("compacted") and len(snaps) == 2
    rows = {(r["k"], r["v"]) for r in store.read("t").collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}  # nothing lost


def test_compaction_aborts_when_rewrite_set_changes(spark, tmp_path):
    """If the snapshots being rewritten are no longer live at commit
    time (concurrent compact/rollback), the compaction must abort and
    clean up its orphan rather than duplicate or resurrect rows."""
    import pytest as _pytest
    from ferenda_spark.operators.graph import ConcurrentCommitError
    store = GraphStore(spark, str(tmp_path / "g"))
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")
    store.append(df1, "t")
    store.append(df2, "t")

    orig = store._read_manifest
    fired = {"done": False}

    def read_with_concurrent_rollback(table):
        snaps = orig(table)
        if not fired["done"]:
            fired["done"] = True
            store.rollback("t")       # competing writer drops snap 2
        return snaps

    store._read_manifest = read_with_concurrent_rollback
    try:
        with _pytest.raises(ConcurrentCommitError):
            store.compact("t", target_partitions=1)
    finally:
        store._read_manifest = orig

    # table reflects the rollback, untouched by the aborted compact
    rows = {(r["k"], r["v"]) for r in store.read("t").collect()}
    assert rows == {(1, "a")}
    # the aborted compact's directory was removed
    names = {p.name for p in (tmp_path / "g" / "t").iterdir()
             if p.is_dir()}
    assert not any(n.startswith("compact-") for n in names)


def _current_edge_set(store):
    return {tuple(r) for r in
            store.read_current("edge").select("subj", "pred",
                                              "obj").collect()}


def test_read_current_retires_superseded_versions(spark, tmp_path):
    """A changed page's OLD subgraph must drop out of the
    current-view: the raw union keeps both versions (snapshot
    retention), read_current keeps only the latest committed hash."""
    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)
    run_pipeline(spark, pages, ents, store)
    v1_current = _current_edge_set(store)

    # a DOC page (index/listing pages emit no triples)
    url0 = (pages.filter(F.col("url").contains("/res/rfc/"))
            .orderBy("url").first()["url"])
    changed = pages.withColumn(
        "html",
        F.when(F.col("url") == url0,
               F.concat(F.col("html"), F.lit(b" "))
               ).otherwise(F.col("html")))
    stats = run_pipeline(spark, changed, ents, store)
    assert stats["pages"] == 1

    # raw union retains BOTH versions' subgraphs (snapshot retention)
    raw_hashes = (store.read("edge").filter(F.col("src_url") == url0)
                  .select("src_hash").distinct().count())
    assert raw_hashes == 2
    # current view keeps exactly the LATEST committed hash for url0
    cur_hashes = [r["src_hash"] for r in
                  store.read_current("edge")
                  .filter(F.col("src_url") == url0)
                  .select("src_hash").distinct().collect()]
    new_hash = (store.read("provenance")
                .filter((F.col("url") == url0) & F.col("success"))
                .orderBy(F.desc("attempt_ts")).first()["input_hash"])
    assert cur_hashes == [new_hash]
    # every other url's current edges are untouched
    cur = _current_edge_set(store)
    assert {t for t in cur if not t[0].startswith(url0)} == \
        {t for t in v1_current if not t[0].startswith(url0)}


def test_read_current_hides_orphan_partial_appends(spark, tmp_path):
    """Edges appended WITHOUT their provenance commit record (a
    writer died mid-batch) are invisible in read_current, and a
    replay converges to the clean single-run result."""
    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)
    run_pipeline(spark, pages, ents, store)
    clean = _current_edge_set(store)

    # simulate the crash window: recompute a page's edges and append
    # them WITHOUT a provenance row (same content, so a duplicate),
    # plus a fabricated uncommitted hash (partial new version)
    some = store.read("edge").limit(5)
    store.append(some, "edge")                          # replay dup
    store.append(some.withColumn("src_hash", F.lit("deadbeef")),
                 "edge")                                # orphan vers.
    assert store.read("edge").count() > len(clean)
    assert _current_edge_set(store) == clean


def test_compact_current_only_materializes_latest_view(spark, tmp_path):
    """compact(current_only=True) rewrites read_current: superseded
    versions and orphan appends are gone from plain read(), resume
    state (provenance) untouched."""
    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)
    run_pipeline(spark, pages, ents, store)
    url0 = (pages.filter(F.col("url").contains("/res/rfc/"))
            .orderBy("url").first()["url"])
    changed = pages.withColumn(
        "html", F.when(F.col("url") == url0,
                       F.concat(F.col("html"), F.lit(b" "))
                       ).otherwise(F.col("html")))
    run_pipeline(spark, changed, ents, store)
    store.append(store.read("edge").limit(3)
                 .withColumn("src_hash", F.lit("deadbeef")), "edge")

    want = _current_edge_set(store)
    store.compact("edge", target_partitions=2, current_only=True)
    store.vacuum("edge", orphan_grace_s=0)
    got_raw = {tuple(r) for r in store.read("edge")
               .select("subj", "pred", "obj").collect()}
    assert got_raw == want
    assert (store.read("edge").filter(F.col("src_url") == url0)
            .select("src_hash").distinct().count()) == 1
    # resume still a no-op after the rewrite
    assert run_pipeline(spark, changed, ents, store)["skipped"] is True


def test_time_travel_read_at(spark, tmp_path):
    """read_at(snapshot_id) returns the table state AS OF that commit;
    read_at(as_of_ts) resolves by commit timestamp; compaction expires
    old snapshot ids (the Iceberg retention contract)."""
    import pytest
    store = GraphStore(spark, str(tmp_path / "g"))
    s1 = store.append(spark.createDataFrame([(1,)], "v long"), "t")
    ts_after_s1 = store.snapshots("t")[-1]["ts"]
    s2 = store.append(spark.createDataFrame([(2,)], "v long"), "t")
    store.append(spark.createDataFrame([(3,)], "v long"), "t")

    assert {r["v"] for r in store.read_at("t", s1).collect()} == {1}
    assert {r["v"] for r in store.read_at("t", s2).collect()} == {1, 2}
    assert {r["v"] for r in store.read("t").collect()} == {1, 2, 3}
    assert {r["v"] for r in store.read_at(
        "t", as_of_ts=ts_after_s1).collect()} == {1}

    with pytest.raises(KeyError, match="no snapshot at or before"):
        store.read_at("t", as_of_ts=ts_after_s1 - 10_000)
    with pytest.raises(ValueError, match="exactly one"):
        store.read_at("t")
    with pytest.raises(KeyError, match="not in table"):
        store.read_at("t", "snap-nope")

    # compaction rewrites the live set: old ids are no longer
    # addressable, the current state is unchanged
    store.compact("t")
    with pytest.raises(KeyError, match="not in table"):
        store.read_at("t", s1)
    assert {r["v"] for r in store.read("t").collect()} == {1, 2, 3}
    last = store.snapshots("t")[-1]["id"]
    assert {r["v"] for r in store.read_at("t", last).collect()} == {1, 2, 3}


def test_time_travel_ts_is_commit_time_and_compaction_guard(spark, tmp_path):
    """Review fix: as_of_ts uses manifest-prefix semantics; a ts
    inside a compaction's reordering raises instead of resolving to a
    state that no longer exists."""
    import pytest
    store = GraphStore(spark, str(tmp_path / "g"))
    store.append(spark.createDataFrame([(1,)], "v long"), "t")
    ts1 = store.snapshots("t")[-1]["ts"]
    store.append(spark.createDataFrame([(2,)], "v long"), "t")
    store.compact("t")
    store.append(spark.createDataFrame([(3,)], "v long"), "t")
    # after compaction the pre-compaction instants are unaddressable
    # (either refusal branch is the same retention contract: nothing
    # at-or-before, or inside the rewrite's ts inversion)
    with pytest.raises(KeyError,
                       match="no snapshot at or before|rewritten by"):
        store.read_at("t", as_of_ts=ts1)
    # the post-compaction commit IS addressable and complete
    ts3 = store.snapshots("t")[-1]["ts"]
    assert {r["v"] for r in store.read_at(
        "t", as_of_ts=ts3).collect()} == {1, 2, 3}


# --- dependency-triggered regeneration (regen.py) --------------------------

def test_regenerate_exact_dependent_set(spark, tmp_path):
    """Touching ONE doc regenerates precisely that doc plus its
    transitive dependents over the citation graph — and nothing else
    (the reference's add_dependency + needed('generate') loop,
    documentrepository.py:2055-2077, documentstore.py:438-457)."""
    from ferenda_spark.operators.regen import (
        dependency_pairs, regenerate, stale_set)

    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    ents = entities_df(spark)
    run_pipeline(spark, pages, ents, store)

    # first generate pass: everything is new → everything generates
    first = regenerate(spark, pages, store)
    assert first["changed"] == N and first["regenerated"] == N

    # immediate rerun: nothing pending
    again = regenerate(spark, pages, store)
    assert again["skipped"] is True

    # touch one page → exactly it + its transitive dependents
    victim = "https://example.org/res/rfc/3"
    touched = pages.withColumn(
        "html",
        F.when(F.col("url") == victim,
               F.concat(F.col("html"), F.lit(b" ")))
        .otherwise(F.col("html")))
    deps = dependency_pairs(store.read_current("edge"),
                            pages.select("url"))
    changed = spark.createDataFrame([(victim,)], "url string")
    want = {(r["url"], r["depth"])
            for r in stale_set(deps, changed).collect()}
    assert (victim, 0) in want

    third = regenerate(spark, touched, store)
    got = {(r["url"], r["depth"]) for r in third["urls"].collect()}
    assert got == want
    assert third["changed"] == 1
    assert third["regenerated"] == len(want) < N

    # committed: the same touched input is now a no-op
    fourth = regenerate(spark, touched, store)
    assert fourth["skipped"] is True


def test_stale_set_cycle_and_depth(spark):
    """Cycles terminate; depth is the minimum dependency distance."""
    from ferenda_spark.operators.regen import stale_set
    deps = spark.createDataFrame(
        [("B", "A"), ("C", "B"), ("A", "C"),   # 3-cycle
         ("D", "C"), ("D", "A")],              # D two ways, min depth
        "url string, depends_on string")
    changed = spark.createDataFrame([("A",)], "url string")
    got = {(r["url"], r["depth"]) for r in stale_set(deps, changed).collect()}
    assert got == {("A", 0), ("B", 1), ("D", 1), ("C", 2)}
    bounded = {(r["url"], r["depth"])
               for r in stale_set(deps, changed, max_depth=1).collect()}
    assert bounded == {("A", 0), ("B", 1), ("D", 1)}


def test_regenerate_commits_after_emit(spark, tmp_path):
    """Crash contract: the generate provenance append happens AFTER
    the emit sink — a sink failure leaves no provenance, so the replay
    regenerates the same set instead of permanently skipping pages
    that were never rendered."""
    import pytest
    from ferenda_spark.operators.regen import regenerate

    store = GraphStore(spark, str(tmp_path / "g"))
    pages = pages_df(spark, N, partitions=2)
    run_pipeline(spark, pages, entities_df(spark), store)

    class Boom(RuntimeError):
        pass

    def failing_sink(todo, stale):
        raise Boom("render died")

    with pytest.raises(Boom):
        regenerate(spark, pages, store, emit=failing_sink)
    # nothing committed → the full set is still pending
    assert not (store.exists("provenance") and
                store.read("provenance")
                .filter(F.col("stage") == "generate").count())

    seen = {}

    def sink(todo, stale):
        seen["urls"] = {r["url"] for r in stale.select("url").collect()}

    ok = regenerate(spark, pages, store, emit=sink)
    assert ok["regenerated"] == N and len(seen["urls"]) == N
    # and now it is committed
    assert regenerate(spark, pages, store)["skipped"] is True


def test_partition_spec_prunes_and_preserves(spark, tmp_path):
    """Iceberg-style partition spec: {"edge": ["pred"]} lays snapshots
    out as pred=<v>/ directories; a constant-predicate filter (every
    SPARQL pattern shape) prunes partitions at planning time, reads
    restore identical multisets, and pre-spec unpartitioned snapshots
    stay readable side-by-side (spec evolution)."""
    plain = GraphStore(spark, str(tmp_path / "g"))
    part = GraphStore(spark, str(tmp_path / "g"),
                      partition_spec={"edge": ["pred"]})
    rows = [(f"s{i}", p, f"o{i}", False, None, None)
            for i in range(60) for p in
            ("dcterms:references", "dcterms:isPartOf", "rdf:type")]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
        "obj_is_literal boolean, obj_datatype string, obj_lang string")
    # snapshot 1 unpartitioned (pre-spec), snapshot 2 partitioned
    plain.append(df.limit(30), "edge")
    part.append(df, "edge")

    got = part.read("edge")
    assert got.count() == 180 + 30
    # multiset round-trip by name (column ORDER may differ: partition
    # columns come last in the restored schema)
    all_rows = {(r["subj"], r["pred"], r["obj"]) for r in got.collect()}
    assert ("s0", "rdf:type", "o0") in all_rows

    filtered = got.filter(F.col("pred") == "dcterms:references")
    assert filtered.count() == 60 + 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the partitioned snapshot's scan carries the pred partition filter
    assert "PartitionFilters" in plan and "pred" in plan

    # a READER must not need the writer's spec: the layout is
    # self-describing per snapshot (serving CLI / downstream jobs
    # open stores with GraphStore(spark, dir) and no spec)
    specless = GraphStore(spark, str(tmp_path / "g"))
    assert specless.read("edge").count() == 180 + 30
    assert {(r["subj"], r["pred"], r["obj"])
            for r in specless.read("edge").collect()} == all_rows


def test_snapshot_metrics_per_commit_and_rollup(spark, tmp_path):
    """Every committed snapshot gets one metrics row (count + HLL
    sketch), and unioning the sketches answers a cross-snapshot
    distinct count without rescanning the table."""
    from ferenda_spark.operators.graph import GraphStore, snapshot_metrics
    from ferenda_spark.operators.profile import merge_sketches
    store = GraphStore(spark, str(tmp_path / "g"))
    rows1 = [(f"s{i % 20}", "p", f"o{i}") for i in range(100)]
    rows2 = [(f"s{i % 30}", "p", f"o{i}") for i in range(50)]
    sch = "subj string, pred string, obj string"
    store.append(spark.createDataFrame(rows1, sch), "edge")
    store.append(spark.createDataFrame(rows2, sch), "edge")
    m = snapshot_metrics(store, "edge")
    got = sorted((r["snapshot_id"], r["n_rows"], r["n_distinct_est"])
                 for r in m.collect())
    assert len(got) == 2
    assert got[0][1] == 100 and got[1][1] == 50
    assert abs(got[0][2] - 20) <= 1 and abs(got[1][2] - 30) <= 1
    rolled = merge_sketches(m).collect()[0]["n_distinct_est"]
    # distinct subjects across BOTH snapshots = 30 (s0..s29)
    assert abs(rolled - 30) <= 2
    import pytest
    with pytest.raises(FileNotFoundError):
        snapshot_metrics(store, "nope")

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

"""Graph materialization: triples → (node, edge, provenance) tables
with snapshot lineage and idempotent resume.

The Spark restatement of the reference's relate/distill phases
(/root/reference/ferenda/documentrepository.py:1885-1995 ``relate``,
documentstore.py:400-470 ``needed()`` mtime freshness, documententry.py
:266-342 per-document status/duration lineage records): each stage
writes to a snapshot-committed table; a rerun anti-joins its input
against the last committed snapshot's (url, input_hash) set, so only
new/changed documents reprocess, and old snapshots are retained.

In production this is Iceberg (``df.writeTo(tbl).append()`` /
``MERGE INTO`` on (url, input_hash); snapshots are Iceberg snapshots).
The sandbox has no Iceberg runtime jars, so ``GraphStore`` implements
the identical contract over parquet directories with an atomically
renamed JSON manifest — every method maps 1:1 onto an Iceberg call,
noted inline.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

class ConcurrentCommitError(RuntimeError):
    """A competing writer changed the manifest in a way that makes
    this commit unsafe (rewrite set no longer live). The Iceberg
    analog is a CommitFailedException after CAS validation."""


PROVENANCE_SCHEMA = (
    "url string, stage string, attempt_ts timestamp, success boolean, "
    "duration_s double, rows_out long, warnings string, error string, "
    "input_hash string, partition_id int"
)


def _try_break_stale(path: str, stale_after_s: float) -> None:
    """Break ``path`` if it is a stale commit lock.

    Breakers serialize on an O_EXCL intent file, and the winner
    re-reads the lock's (token, mtime) INSIDE that critical section,
    unlinking only a lock that is STILL stale and carries the token
    it originally judged stale. A fresh lock created between the
    outer staleness check and the unlink has a different token (and a
    young mtime) and survives — the TOCTOU the previous
    rename-then-unlink scheme still had: two breakers could both pass
    the mtime check, the first would break+let a new holder acquire,
    and the second's pending rename would then steal the new holder's
    live lock. A breaker that crashes inside the critical section
    leaves its intent file; peers clear it once it too is stale.
    """
    try:
        if time.time() - os.path.getmtime(path) <= stale_after_s:
            return
        with open(path) as lf:
            stale_token = lf.read()
    except (FileNotFoundError, OSError):
        return  # holder released / peer broke it — retry acquisition
    intent = path + ".break"
    try:
        ifd = os.open(intent, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:  # clear only a CRASHED breaker's stale intent
            if time.time() - os.path.getmtime(intent) > stale_after_s:
                os.unlink(intent)
        except FileNotFoundError:
            pass
        return
    try:
        os.close(ifd)
        try:
            with open(path) as lf:
                cur = lf.read()
            if (cur == stale_token
                    and time.time() - os.path.getmtime(path)
                    > stale_after_s):
                os.unlink(path)
        except FileNotFoundError:
            pass
    finally:
        try:
            os.unlink(intent)
        except FileNotFoundError:
            pass


class GraphStore:
    """Snapshot-committed table store (Iceberg-contract emulation).

    ``partition_spec`` maps table → partition columns, the Iceberg
    partition-spec analog: ``{"edge": ["pred"]}`` lays every snapshot
    out as ``pred=<value>/`` directories, so a query filtering on a
    predicate (every SPARQL triple pattern with a constant predicate,
    i.e. nearly all of them) prunes to that predicate's files at
    PLANNING time — at 10^12 edges the scan never touches the other
    predicates' data.  Partitioning changes layout only: reads
    restore the column (select by name, not position), multisets are
    identical, and unpartitioned snapshots of the same table written
    before the spec remain readable side-by-side (spec evolution,
    like Iceberg's)."""

    def __init__(self, spark: SparkSession, root: str,
                 partition_spec: dict | None = None):
        self.spark = spark
        self.root = root
        self.partition_spec = dict(partition_spec or {})
        os.makedirs(root, exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_snapshots.json")

    def _read_manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, snapshots: list[dict]) -> None:
        # Atomic commit: write tmp, rename over manifest — the analog
        # of an Iceberg metadata-file swap.
        p = self._manifest_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snapshots, f, indent=1)
        os.replace(tmp, p)

    def _commit_lock(self, table: str, timeout_s: float = 60.0,
                     stale_after_s: float = 300.0):
        """Mutual exclusion for read-merge-commit sequences — the
        stand-in for the Iceberg catalog's CAS commit. O_EXCL lock
        file on the table directory; valid on a POSIX fs (object
        stores need a real catalog service, which is the point of
        Iceberg's metastore).

        Stale-lock recovery: manifest commits are sub-second, so a
        lock file older than ``stale_after_s`` belongs to a writer
        that died mid-commit (SIGKILL/OOM before the finally-unlink);
        it is broken and acquisition retried rather than wedging the
        table forever.  The lock file records pid+timestamp for
        operator forensics."""
        import contextlib

        @contextlib.contextmanager
        def lock():
            tdir = os.path.join(self.root, table)
            os.makedirs(tdir, exist_ok=True)
            path = os.path.join(tdir, "_commit.lock")
            token = f"{os.getpid()}:{uuid.uuid4().hex}"
            deadline = time.time() + timeout_s
            while True:
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    break
                except FileExistsError:
                    _try_break_stale(path, stale_after_s)
                    if time.time() > deadline:
                        raise ConcurrentCommitError(
                            f"commit lock on {table} held past "
                            f"{timeout_s}s")
                    time.sleep(0.05)
            try:
                os.write(fd, token.encode())
                os.close(fd)
                yield
            finally:
                # Release only OUR lock: if the lock was broken as
                # stale mid-commit and a peer now holds a fresh one,
                # the token differs and we must not unlink it.
                # (A commit that overruns stale_after_s has already
                # lost mutual exclusion; commits are sub-second.)
                try:
                    with open(path) as lf:
                        owner = lf.read()
                    if owner == token:
                        os.unlink(path)
                except FileNotFoundError:
                    pass  # broken as stale by a peer

        return lock()

    def snapshots(self, table: str) -> list[dict]:
        return self._read_manifest(table)

    # -- table ops (each maps to one Iceberg call) --------------------------

    def _write_snapshot(self, df: DataFrame, table: str,
                        snap_id: str, **extra) -> dict:
        """Write one snapshot directory and build its manifest entry
        (shared by append and compact so the on-disk layout cannot
        fork between them)."""
        path = os.path.join(self.root, table, snap_id)
        cols = self.partition_spec.get(table)
        w = df.write.mode("overwrite")
        if cols:
            w = w.partitionBy(*cols)
        w.parquet(path)
        return {"id": snap_id, "path": path, "ts": time.time(), **extra}

    def append(self, df: DataFrame, table: str) -> str:
        """Iceberg: ``df.writeTo(table).append()``. The data write
        happens outside the commit lock (long); only the
        read-modify-write of the manifest is serialized."""
        snap_id = f"snap-{len(self._read_manifest(table)):06d}-{uuid.uuid4().hex[:8]}"
        entry = self._write_snapshot(df, table, snap_id)
        with self._commit_lock(table):
            # ts is COMMIT time, assigned under the lock: manifest
            # order and ts order can then never disagree, so
            # read_at(as_of_ts) is repeatable — a slow writer whose
            # data write predates a faster peer's commit cannot
            # appear retroactively in the past
            entry["ts"] = time.time()
            snaps = self._read_manifest(table)
            snaps.append(entry)
            self._commit(table, snaps)
        return snap_id

    def read(self, table: str) -> DataFrame:
        """Iceberg: ``spark.read.table(table)`` (current snapshot).
        Raw union of every committed append — includes superseded
        page versions and any orphaned partial appends; query-facing
        consumers want :meth:`read_current`."""
        snaps = self._read_manifest(table)
        if not snaps:
            raise FileNotFoundError(f"table {table} has no snapshots")
        return self._read_paths([s["path"] for s in snaps])

    def _read_paths(self, paths: list[str]) -> DataFrame:
        """Union per-snapshot scans by NAME.  One multi-path parquet
        scan refuses partitioned snapshot roots ("conflicting
        directory structures") and mixed flat/partitioned layouts
        (spec evolution), and a READER must not need the writer's
        partition spec — the layout is self-describing per snapshot.
        Filters on a partition column still prune inside each
        partitioned scan; same files either way."""
        out = self.spark.read.parquet(paths[0])
        for q in paths[1:]:
            out = out.unionByName(self.spark.read.parquet(q))
        return out

    def read_current(self, table: str,
                     stage: str = "materialize") -> DataFrame:
        """Exactly-once, latest-version view of a lineage-tagged
        table (edge/node rows carrying ``src_url``/``src_hash``).

        The provenance success row is the COMMIT RECORD for a
        (url, input_hash) unit of work, written last by
        ``run_pipeline``. Three consequences, each closing a gap the
        raw union has:

        * rows whose (src_url, src_hash) have no success record are
          INVISIBLE — a writer that died between the edge append and
          the provenance append leaves an orphan snapshot that never
          surfaces (the at-least-once window of the non-atomic
          three-table commit);
        * rows whose hash is not their url's LATEST committed hash
          are RETIRED — a changed page supersedes its old version's
          whole subgraph instead of accumulating stale triples (the
          Iceberg analog of this view is ``MERGE INTO`` on
          (url, input_hash));
        * a replay of the same (url, input_hash) is a deterministic
          recompute emitting identical rows, so the final full-row
          ``dropDuplicates`` restores exactly-once observation.

        At 100 TB the semi-join is an AQE-planned join keyed by url
        and the distinct is one shuffle of the CURRENT graph —
        run it once in compaction/export, not per ad-hoc query, or
        let ``compact()`` materialize it.

        Tables without lineage columns (provenance itself, legacy
        appends) pass through as ``read``.
        """
        df = self.read(table)
        if "src_url" not in df.columns or not self.exists("provenance"):
            return df
        prov = (self.read("provenance")
                .filter((F.col("stage") == stage) & F.col("success")))
        latest = (prov.groupBy("url")
                  .agg(F.max(F.struct("attempt_ts", "input_hash"))
                       .getField("input_hash").alias("src_hash"))
                  .select(F.col("url").alias("src_url"), "src_hash"))
        return (df.join(latest, ["src_url", "src_hash"], "left_semi")
                .dropDuplicates())

    def read_at(self, table: str, snapshot_id: str | None = None,
                as_of_ts: float | None = None) -> DataFrame:
        """Time travel — Iceberg: ``VERSION AS OF`` (``snapshot_id``)
        / ``TIMESTAMP AS OF`` (``as_of_ts``): the table state at a
        past commit = the union of manifest entries up to and
        including that snapshot (append-only commit log).

        Same retention contract as Iceberg: a snapshot rewritten away
        by :meth:`compact` or expired by :meth:`vacuum` is no longer
        addressable — its id raises, it does not silently resolve to
        something else."""
        snaps = self._read_manifest(table)
        if not snaps:
            raise FileNotFoundError(f"table {table} has no snapshots")
        if (snapshot_id is None) == (as_of_ts is None):
            raise ValueError("read_at needs exactly one of snapshot_id "
                             "or as_of_ts")
        if snapshot_id is not None:
            ids = [s["id"] for s in snaps]
            if snapshot_id not in ids:
                raise KeyError(
                    f"snapshot {snapshot_id!r} not in table {table} "
                    f"(compacted or vacuumed away?)")
            keep = snaps[: ids.index(snapshot_id) + 1]
        else:
            # PREFIX semantics, not a ts filter: state as of T = the
            # manifest prefix ending at the last commit with ts ≤ T.
            # Commit timestamps are assigned under the commit lock, so
            # an append-only history is ts-monotone and the two views
            # agree; after a compaction the rewritten head carries a
            # NEWER ts than the carried-over tail, and a T inside that
            # inversion addresses a pre-compaction state that no
            # longer exists — refuse it (the same retention contract
            # as an expired snapshot id).
            last = max((i for i, s in enumerate(snaps)
                        if s["ts"] <= as_of_ts), default=None)
            if last is None:
                raise KeyError(f"table {table} has no snapshot at or "
                               f"before ts {as_of_ts}")
            keep = snaps[: last + 1]
            if any(s["ts"] > as_of_ts for s in keep):
                raise KeyError(
                    f"table {table}: ts {as_of_ts} addresses a state "
                    f"rewritten by compaction (no longer addressable)")
        return self._read_paths([s["path"] for s in keep])

    def exists(self, table: str) -> bool:
        return bool(self._read_manifest(table))

    def rollback(self, table: str, n: int = 1) -> None:
        """Iceberg: rollback_to_snapshot — drop the last n snapshots."""
        with self._commit_lock(table):
            snaps = self._read_manifest(table)
            self._commit(table, snaps[: max(0, len(snaps) - n)])

    def compact(self, table: str, target_partitions: int = 8,
                current_only: bool = False) -> str:
        """Iceberg: ``rewrite_data_files`` — rewrite the snapshots
        live at start-of-compaction into ONE snapshot of
        ``target_partitions`` files.

        Incremental runs append one snapshot per micro-batch/stage
        run; after thousands of runs the table is thousands of small
        files and every read pays per-file open cost (the classic
        small-files problem).  The rewrite uses ``repartition`` (a
        shuffle of data being fully rewritten anyway, like Iceberg's
        bin-packing rewrite) so the many-small-file read stays fully
        parallel — ``coalesce`` would fold it into
        ``target_partitions`` sequential file-opening tasks.

        Concurrency: the rewrite window is long, so the commit
        validates-and-merges like Iceberg under the commit lock —
        snapshots appended while the rewrite ran are carried over
        untouched after the compacted entry.  If any snapshot of the
        rewrite set is NO LONGER live at commit time (a concurrent
        compact, rollback, or truncate removed it), the commit
        ABORTS with :class:`ConcurrentCommitError` and removes its
        own orphan directory — carrying on would duplicate rows
        (double-compaction) or resurrect deliberately-dropped ones.
        Old snapshot directories stay on disk until :meth:`vacuum`
        (the expire_snapshots analog) — the manifest swap must not
        race in-flight readers of the old file set.

        Resume state is unaffected: pending_pages reads table
        contents, not snapshot layout (provenance, not edge/node).

        ``current_only=True`` rewrites the :meth:`read_current` view
        instead of the raw union: superseded page versions, orphan
        partial appends, and replay duplicates are dropped in the
        same pass (the expire-old-versions / MERGE materialization
        analog), so subsequent plain ``read`` calls see the
        exactly-once latest graph without paying the per-query
        semi-join + distinct."""
        import shutil
        before = self._read_manifest(table)
        if not before:
            raise FileNotFoundError(f"table {table} has no snapshots")
        current = (self.read_current(table) if current_only
                   else self.spark.read
                   .parquet(*[s["path"] for s in before])
                   ).repartition(target_partitions)
        snap_id = f"compact-{uuid.uuid4().hex[:8]}"
        entry = self._write_snapshot(current, table, snap_id,
                                     compacted=True,
                                     current_only=current_only)
        rewritten = {s["id"] for s in before}
        with self._commit_lock(table):
            entry["ts"] = time.time()   # commit time, like append()
            now = self._read_manifest(table)
            live = {s["id"] for s in now}
            if not rewritten <= live:
                shutil.rmtree(entry["path"], ignore_errors=True)
                raise ConcurrentCommitError(
                    f"compact {table}: rewrite set changed underneath "
                    f"(missing {sorted(rewritten - live)}); retry")
            tail = [s for s in now if s["id"] not in rewritten]
            self._commit(table, [entry] + tail)
        return snap_id

    def vacuum(self, table: str, orphan_grace_s: float = 3600.0
               ) -> list[str]:
        """Iceberg: ``expire_snapshots`` + orphan-file cleanup —
        delete snapshot directories no longer referenced by the
        manifest (after compaction or rollback).

        Runs under the commit lock so the live set cannot change
        mid-sweep.  Directories younger than ``orphan_grace_s`` are
        skipped: a concurrent writer materializes its parquet BEFORE
        committing the manifest entry, so a just-written uncommitted
        snapshot must not be swept (the standard orphan-retention
        rule; pass 0 only when no writers can be active)."""
        import shutil
        tdir = os.path.join(self.root, table)
        removed = []
        with self._commit_lock(table):
            live = {s["id"] for s in self._read_manifest(table)}
            cutoff = time.time() - orphan_grace_s
            for name in sorted(os.listdir(tdir)):
                full = os.path.join(tdir, name)
                if (os.path.isdir(full) and name not in live
                        and os.path.getmtime(full) < cutoff):
                    shutil.rmtree(full)
                    removed.append(name)
        return removed

    def truncate(self, table: str) -> None:
        with self._commit_lock(table):
            self._commit(table, [])


# -- resume / incremental recompute ----------------------------------------

def with_input_hash(pages: DataFrame, config_salt: str = "") -> DataFrame:
    """Content hash for change detection (reference: md5 content hashes,
    documententry.py:248-253; download_is_different:1096-1101).

    ``config_salt`` folds the run's EXTRACTION CONFIGURATION (discovery
    regex, forced language, grammar version, ...) into the hash:
    changing the config changes every input_hash, so the resume
    anti-join reprocesses the whole corpus and the changed-page
    contract retires each page's previous-config subgraph — instead
    of a corrected rerun silently no-op'ing against provenance rows
    committed under the wrong configuration.

    NULL html hashes as empty content rather than NULL: a NULL
    input_hash never matches itself in the resume anti-join's
    equality keys, so such a page would re-process on EVERY run
    (unbounded provenance growth, never-skipped replays)."""
    content = F.coalesce(F.col("html").cast("binary"), F.lit(b""))
    if config_salt:
        # empty salt keeps the historical pure-content hash, so
        # existing stores stay resumable
        content = F.concat(F.encode(F.lit(config_salt + "|"), "UTF-8"),
                           content)
    return pages.withColumn("input_hash", F.md5(content))


def pending_pages(pages: DataFrame, store: GraphStore,
                  stage: str = "materialize",
                  config_salt: str = "") -> DataFrame:
    """Anti-join pages against the last committed provenance snapshot:
    only urls that are new, changed (hash differs), or previously
    failed remain — the ``needed()`` freshness check as a join.

    At scale this is a shuffle-free broadcast when the committed set
    is small relative to input, else an AQE-planned SMJ on url.
    """
    hashed = with_input_hash(pages, config_salt)
    if not store.exists("provenance"):
        return hashed
    done = (store.read("provenance")
            .filter((F.col("stage") == stage) & F.col("success"))
            .select("url", "input_hash").distinct())
    return hashed.join(done, ["url", "input_hash"], "left_anti")


def provenance_rows(pages: DataFrame, stage: str,
                    rows_out_col=None, duration_s: float = 0.0) -> DataFrame:
    """One lineage row per (url × stage × attempt), with the physical
    partition id — per-partition metrics per the north rule."""
    hashed = pages if "input_hash" in pages.columns else with_input_hash(pages)
    return hashed.select(
        "url",
        F.lit(stage).alias("stage"),
        F.current_timestamp().alias("attempt_ts"),
        F.lit(True).alias("success"),
        F.lit(float(duration_s)).alias("duration_s"),
        (rows_out_col if rows_out_col is not None else F.lit(0)
         ).cast("long").alias("rows_out"),
        F.lit(None).cast("string").alias("warnings"),
        F.lit(None).cast("string").alias("error"),
        "input_hash",
        F.spark_partition_id().alias("partition_id"),
    )


# -- node/edge projections ---------------------------------------------------

def edges_from_triples(triples: DataFrame) -> DataFrame:
    return triples.select("subj", "pred", "obj", "obj_is_literal",
                          "obj_datatype", "obj_lang")


def nodes_from_triples(triples: DataFrame) -> DataFrame:
    """node(uri, rdf_type, label, props) — a pivot-style projection of
    the triple table (reference facet_query SELECT shape,
    documentrepository.py:2290-2380)."""
    t = triples
    # props: first (minimum) literal obj per pred. map_from_entries
    # THROWS on duplicate keys under Spark's default
    # mapKeyDedupPolicy=EXCEPTION, and a subject CAN carry two
    # literals for one predicate (e.g. an in-batch redelivery of an
    # updated page) — so entries are sorted and folded to one
    # deterministic value per pred before the map is built.
    lit_entries = F.array_sort(F.filter(
        F.collect_list(F.when(F.col("obj_is_literal"),
                              F.struct("pred", "obj"))),
        lambda e: e["obj"].isNotNull()))
    empty = F.array().cast("array<struct<pred:string,obj:string>>")
    first_per_pred = F.aggregate(
        lit_entries, empty,
        lambda acc, e: F.when(F.size(acc) == 0, F.array(e))
        .when(F.element_at(acc, F.size(acc))["pred"] == e["pred"], acc)
        .otherwise(F.concat(acc, F.array(e))))
    return (t.groupBy(F.col("subj").alias("uri"))
            .agg(
                F.min(F.when(F.col("pred") == "rdf:type", F.col("obj")))
                .alias("rdf_type"),
                F.min(F.when(F.col("pred") == "dcterms:title",
                             F.col("obj"))).alias("label"),
                F.map_from_entries(first_per_pred).alias("props")))


# -- graph diff / P-R harness ------------------------------------------------

TRIPLE_KEY = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
              "obj_lang"]


def graph_diff(got: DataFrame, want: DataFrame,
               key: list[str] | None = None):
    """(in_both, only_got, only_want) on canonicalized triple sets —
    the reference's validation compare (rdflib graph_diff per
    decorators.py:253-259, assertEqualGraphs testutil.py:58-117)
    restated as intersect/except on DataFrames."""
    key = key or TRIPLE_KEY
    g = got.select(*key).distinct()
    w = want.select(*key).distinct()
    return g.intersect(w), g.subtract(w), w.subtract(g)


def precision_recall(got: DataFrame, want: DataFrame,
                     key: list[str] | None = None) -> dict:
    """Triple P/R vs a golden set (the BASELINE ≥0.95 gate).

    The three set-op counts share both distinct inputs, so each side
    is persisted for the three actions (otherwise intersect+subtract
    ×2 re-scan and re-shuffle each input up to three times)."""
    key = key or TRIPLE_KEY
    g = got.select(*key).distinct().persist()
    w = want.select(*key).distinct().persist()
    try:
        tp = g.intersect(w).count()
        fp = g.subtract(w).count()
        fn = w.subtract(g).count()
    finally:
        g.unpersist()
        w.unpersist()
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": tp / (tp + fp) if tp + fp else 1.0,
        "recall": tp / (tp + fn) if tp + fn else 1.0,
    }


def ntriples_lines(edges: DataFrame) -> DataFrame:
    """Edge rows → N-Triples lines (the reference's dump.nt sink,
    relate_all_teardown documentrepository.py:1860-1871). Unsorted:
    export_ntriples applies the deterministic (render_head-style,
    :1523-1524) ordering once, per output layout."""
    esc = F.col("obj")
    # N-Triples string-escape chain (backslash first, then the rest)
    # (replacement strings are Java-regex replacements: `\\\\` emits
    # two backslash chars, `\\"` emits backslash+quote, `\\n` emits
    # backslash+n)
    for pat, rep in ((r"\\", r"\\\\"), ('"', r'\\"'),
                     ("\n", r"\\n"), ("\r", r"\\r"), ("\t", r"\\t")):
        esc = F.regexp_replace(esc, pat, rep)
    literal = F.concat(
        F.lit('"'), esc, F.lit('"'),
        F.when(F.col("obj_lang").isNotNull(),
               F.concat(F.lit("@"), F.col("obj_lang")))
        .when(F.col("obj_datatype").isNotNull(),
              F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")))
        .otherwise(F.lit("")))
    obj_term = F.when(F.col("obj_is_literal"), literal).otherwise(
        F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
    # no sort here: export_ntriples orders per output layout (a sort
    # baked in here would be immediately destroyed — one dead full
    # shuffle — by the partitions>1 range-repartition path)
    return edges.select(F.concat(
        F.lit("<"), F.col("subj"), F.lit("> <"),
        F.col("pred"), F.lit("> "), obj_term,
        F.lit(" .")).alias("value"))


def export_ntriples(edges: DataFrame, path: str, partitions: int = 1) -> None:
    """Write the sorted NT dump (parity-diff artifact).

    ``partitions == 1`` gives a single globally-sorted file.  For
    ``partitions > 1`` the lines are range-partitioned on their value
    before the write, so part files are globally ordered by file
    index (coalesce after orderBy would merge range partitions
    arbitrarily and lose that)."""
    lines = ntriples_lines(edges)
    if partitions == 1:
        lines.coalesce(1).write.mode("overwrite").text(path)
    else:
        (lines.repartitionByRange(partitions, "value")
         .sortWithinPartitions("value")
         .write.mode("overwrite").text(path))


def snapshot_metrics(store: "GraphStore", table: str,
                     key_col: str = "subj",
                     lg_k: int = 12) -> DataFrame:
    """Per-snapshot metrics over a store table: ``(snapshot_id,
    snap_ts, n_rows, sketch, n_distinct_est)`` — row count plus a
    MERGEABLE HLL distinct sketch of ``key_col`` for every committed
    snapshot, the Iceberg-style snapshot-metadata table
    (``table.snapshots`` + partition stats) this store's manifest
    doesn't persist yet.

    Each snapshot is scanned ONCE (one combinable aggregate per
    snapshot directory — the scans are independent jobs, no shuffle
    between them), and because the sketches merge by union
    (``profile.merge_sketches``), any snapshot RANGE's distinct count
    is answerable later from this metrics table alone — the
    "metrics per commit so any stage can resume and report" half of
    the lineage contract, where ``provenance_rows`` covers the
    per-document half."""
    from ferenda_spark.operators.profile import distinct_sketches
    spark = store.spark
    outs = []
    for snap in store.snapshots(table):
        df = store._read_paths([snap["path"]])
        m = (distinct_sketches(
                df.withColumn("__g", F.lit(1)), ["__g"], key_col,
                lg_k=lg_k)
             .select(F.lit(snap["id"]).alias("snapshot_id"),
                     F.lit(snap["ts"]).cast("double").alias("snap_ts"),
                     F.lit(None).cast("long").alias("n_rows"),
                     "sketch", "n_distinct_est"))
        n = df.count()
        m = m.withColumn("n_rows", F.lit(n).cast("long"))
        outs.append(m)
    if not outs:
        raise FileNotFoundError(f"table {table} has no snapshots")
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out

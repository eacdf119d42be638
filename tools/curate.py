"""spark-submit end-to-end training-data curation: documents parquet
in, deterministic training shards out, one CURATE_STATS line per
stage.

    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/curate.py <docs_parquet> <out_dir> \
        [--bench BENCH_PARQUET] [--budget 50000] [--jaccard 0.8] \
        [--id-col doc_id] [--text-col text]

The chain, each stage an independently oracle-gated operator:

  0. (--pages: raw crawl in)   noindex opt-out → declared-canonical
                               snapshot dedup → main-content strip
                               (webfilter.noindex_filter /
                               declared_canonical_fetch,
                               content.main_content) — the wild-HTML
                               front producing (url, text)
  1. Gopher rule filter        (operators/textstats.gopher_rules)
  2. exact dedup               (keep min id per text md5)
  3. MinHash near-dup clusters (LSH bands → verify → components,
                                keep each cluster's min id)
  4. decontamination           (--bench: Bloom-prefiltered 13-gram
                                collision scrub, exact after verify)
  5. shard packing + export    (operators/shards.write_training_shards:
                                data/shard=k + manifest sidecar)

Every drop is counted and printed (never silent); exits nonzero if
nothing survives.  This is the one-command shape of the reference's
``ferenda-build.py all all`` for the training-corpus use case.
"""

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="curate")
    p.add_argument("docs_parquet")
    p.add_argument("out_dir")
    p.add_argument("--bench", default=None,
                   help="benchmark parquet (text column) to "
                        "decontaminate against")
    p.add_argument("--budget", type=int, default=50000,
                   help="per-shard weight budget (chars)")
    p.add_argument("--jaccard", type=float, default=0.8,
                   help="near-dup similarity threshold")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-words", type=int, default=50,
                   help="Gopher word-count floor (published default 50)")
    p.add_argument("--min-stopwords", type=int, default=2,
                   help="Gopher required-stopword floor (published "
                        "default 2; lower for non-English or "
                        "synthetic corpora)")
    p.add_argument("--pages", action="store_true",
                   help="input is a raw crawl pages parquet "
                        "(url, warc_ts, html) instead of extracted "
                        "documents: run the wild-HTML front — "
                        "robots-meta noindex opt-out → "
                        "declared-canonical snapshot dedup → "
                        "main-content chrome strip — then curate the "
                        "extracted text (id = canonical url)")
    return p.parse_args(argv)


def _stat(stage: str, kept: int, dropped: int) -> None:
    print(f"CURATE_STATS stage={stage} kept={kept} dropped={dropped}")
    if kept == 0:
        # fail at the stage that emptied the corpus — never run the
        # LSH/components/Bloom machinery over zero documents
        raise SystemExit(f"curate: no documents survived {stage}")


def run(spark: SparkSession, argv: list[str]) -> dict:
    from ferenda_spark.operators import dedup
    from ferenda_spark.operators.shards import (assign_shards,
                                                write_training_shards)
    from ferenda_spark.operators.textstats import gopher_rules

    args = _parse_args(argv)
    ic, tc = args.id_col, args.text_col
    if args.pages:
        # wild-HTML front: consent → canonical identity → content
        from ferenda_spark.operators.content import main_content
        from ferenda_spark.operators.webfilter import (
            declared_canonical_fetch, noindex_filter)
        pages = spark.read.parquet(args.docs_parquet).persist()
        p0 = pages.count()
        allowed = noindex_filter(pages).persist()
        p1 = allowed.count()
        pages.unpersist()
        _stat("noindex", p1, p0 - p1)
        winners = declared_canonical_fetch(allowed).persist()
        p2 = winners.count()
        allowed.unpersist()
        _stat("canonical_dedup", p2, p1 - p2)
        content = main_content(
            winners.select(F.col("canonical_url").alias("url"),
                           "html"))
        ic, tc = "url", "text"
        docs = (content.filter(F.col("content_chars") > 0)
                .select("url", F.col("content").alias("text"))
                .persist())
        n0 = docs.count()
        winners.unpersist()
        _stat("main_content", n0, p2 - n0)
    else:
        docs = spark.read.parquet(args.docs_parquet).persist()
        n0 = docs.count()

    # 1. rule-based quality floor
    keep_ids = (gopher_rules(docs, text_col=tc, id_col=ic,
                             min_words=args.min_words,
                             min_stopwords=args.min_stopwords)
                .filter(F.col("keep")).select("id"))
    docs1 = docs.join(keep_ids.withColumnRenamed("id", ic), ic).persist()
    n1 = docs1.count()
    docs.unpersist()
    _stat("gopher_rules", n1, n0 - n1)

    # 2. exact dedup: one keeper per identical text
    keepers = (dedup.exact_dedup(docs1, tc, ic)
               .select(F.col("keeper_id").alias(ic)))
    docs2 = docs1.join(keepers, ic).persist()
    n2 = docs2.count()
    docs1.unpersist()
    _stat("exact_dedup", n2, n1 - n2)

    # 3. near-dup clusters: keep each cluster's min id.  components()
    # speaks BIGINT — string ids (--pages canonical urls) ride the
    # deterministic 64-bit hash there and back, the webgraph CLI's
    # host convention
    id_is_str = dict(docs2.dtypes)[ic] == "string"
    if id_is_str:
        keyed = docs2.withColumn("__h", F.xxhash64(F.col(ic)))
        pairs = dedup.minhash_dedup_pairs(keyed, tc, "__h",
                                          threshold=args.jaccard)
        drop = (dedup.components(pairs)
                .filter(F.col("id") != F.col("comp"))
                .select(F.col("id").alias("__h")))
        docs3 = (keyed.join(drop, "__h", "left_anti")
                 .drop("__h").persist())
    else:
        pairs = dedup.minhash_dedup_pairs(docs2, tc, ic,
                                          threshold=args.jaccard)
        drop = (dedup.components(pairs)
                .filter(F.col("id") != F.col("comp"))
                .select(F.col("id").alias(ic)))
        docs3 = docs2.join(drop, ic, "left_anti").persist()
    n3 = docs3.count()
    docs2.unpersist()
    _stat("near_dup", n3, n2 - n3)

    # 4. decontamination — runs only with --bench; a skipped stage
    # prints as skipped, never as ran-and-clean
    docs4: DataFrame = docs3
    n4 = n3
    if args.bench:
        bench = spark.read.parquet(args.bench).select(tc)
        clean = (dedup.decontaminate_bloom(
            docs3, bench, text_col=tc, id_col=ic, bench_text_col=tc)
            .filter(~F.col("contaminated"))
            .select(F.col("id").alias(ic)))
        docs4 = docs3.join(clean, ic).persist()
        n4 = docs4.count()
        docs3.unpersist()
        _stat("decontaminate", n4, n3 - n4)
    else:
        print("CURATE_STATS stage=decontaminate skipped=True "
              "(no --bench)")

    # 5. deterministic shard export
    weighted = docs4.withColumn("__w", F.length(tc).cast("long"))
    assigned = assign_shards(weighted, budget=args.budget,
                             weight_col="__w", key_col=ic)
    write_training_shards(assigned, args.out_dir, weight_col="__w",
                          key_col=ic)
    docs4.unpersist()
    manifest = spark.read.parquet(args.out_dir + "/manifest")
    n_shards = manifest.count()
    print(f"CURATE_STATS stage=shards kept={n4} shards={n_shards} "
          f"out={args.out_dir}")
    return {"in": n0, "out": n4, "shards": n_shards}


if __name__ == "__main__":
    spark = SparkSession.builder.getOrCreate()
    run(spark, sys.argv[1:])

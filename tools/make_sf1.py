"""Synthesize an sf1-class test dir: 10× the sf0.1 tables.

    python tools/make_sf1.py [src_sf_dir] [out_dir] [factor]

documents and embeddings are replicated ``factor`` times with
disjoint id ranges; each document replica appends a replica marker
token to its text so the corpus is not 90% EXACT duplicates (which
would drive the dedup/jaccard family into an unrepresentative
all-pairs regime instead of 10× the sf0.1 workload shape).  Lang,
source, and citation-bearing patterns are preserved, so the KG
extract/mention/link pipeline sees 10× the same distribution.
events/orders/lineitem and the small dims are copied as-is (the
sf1 probe targets the documents-family gates).  Deterministic — no
RNG, no timestamps."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ferenda_spark.session import get_spark  # noqa: E402
from ferenda_spark.sources.testdata import TABLES  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-sf1", master="local[32]",
                      shuffle_partitions=32)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * n_docs)
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" replica"),
                            F.col("rep").cast("string")).alias("text"),
                   "lang", "source",
                   (F.col("n_chars") + 8
                    + F.length(F.col("rep").cast("string")))
                   .alias("n_chars")))
    big.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/documents.parquet")
    print(f"SF1 documents rows={n_docs * factor}")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_emb = emb.count()
    # replicas get their embedding CIRCULAR-SHIFTED by rep positions:
    # exact-duplicate vectors would put 10 copies of every doc in the
    # same LSH bucket, inflating candidate pairs ~O(factor²) — that
    # measures duplication density, not 10× the sf0.1 workload shape
    # (observed: sim_semantic_dedup 15.6× before this perturbation,
    # ~linear after).  A shifted vector is uncorrelated with its
    # source, so each replica behaves like fresh corpus mass.
    dim = len(emb.first()["embedding"])
    shifted = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> element_at(embedding, "
        f"CAST((i + rep) % {dim} AS INT) + 1))")
    bige = (emb.crossJoin(reps)
            .select((F.col("vec_id") + F.col("rep") * n_emb)
                    .alias("vec_id"),
                    shifted.cast("array<float>").alias("embedding"),
                    "label"))
    bige.repartition(16).write.mode("overwrite") \
        .parquet(f"{out}/embeddings.parquet")
    print(f"SF1 embeddings rows={n_emb * factor}")

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst) or os.path.isfile(dst):
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isfile(dst):
                os.remove(dst)
        if os.path.isfile(f"{src}/{t}.parquet"):
            shutil.copyfile(f"{src}/{t}.parquet", dst)
        else:
            shutil.copytree(f"{src}/{t}.parquet", dst)
        print(f"SF1 {t} copied")
    spark.stop()


if __name__ == "__main__":
    main()

"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB training-data pipeline needs:

* **brute-force cosine top-k** — broadcast the (small) query set,
  score every (query, item) with a pure-Column dot product
  (``F.aggregate`` over ``zip_with`` products — JVM-side, no UDF),
  keep top-k per query with a window. Exact baseline; O(Q × N) but
  embarrassingly parallel, no shuffle until the final per-query top-k
  (which AQE coalesces — Q is small).
* **LSH-bucketed (random-hyperplane) top-k** — the scale path: sign
  bits against h deterministic hyperplanes bucket both sides; only
  same-bucket pairs are scored. Sublinear candidate sets; recall
  traded for h. Hyperplane components are a fixed integer formula so
  the identical bucketing is reproducible in ANSI SQL.

No reference counterpart (ferenda has no vector search) — this is a
first-class training-data extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(items: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors per query.

    ``queries(query_id, embedding)`` is broadcast (must be small —
    the per-query fanout is the scan itself). Self-matches (same id)
    are excluded when ids share a domain.
    """
    it = items.select(F.col(id_col).alias("item_id"),
                      _as_double(F.col(vec_col)).alias("ivec"))
    qs = queries.select(F.col(query_id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qvec"))
    scored = (it.join(F.broadcast(qs), F.col("item_id") != F.col("query_id"))
              .select("query_id", "item_id",
                      F.round(cosine(F.col("ivec"), F.col("qvec")), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("item_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "item_id", "cos_sim", "rank"))


def hyperplane(dim: int, j: int) -> list[int]:
    """Deterministic pseudo-random hyperplane j: component i is
    ((i*31 + j*17 + 7) % 11) - 5  (integer, zero-mean-ish).
    Fixed formula ⇒ reproducible in SQL and across engines."""
    return [((i * 31 + j * 17 + 7) % 11) - 5 for i in range(dim)]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 4) -> Column:
    """Bucket id = sum over planes j of 2^j * (dot(vec, plane_j) > 0)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(c)) for c in hyperplane(dim, j)])
        bucket = bucket + F.when(dot(vec, plane) > 0,
                                 F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_topk(items: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_planes: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket (query, item)
    pairs. At scale the items side is hash-partitioned by bucket; the
    query side is broadcast, so this is a map-side bucket filter."""
    it = items.select(F.col(id_col).alias("item_id"),
                      _as_double(F.col(vec_col)).alias("ivec"))
    it = it.withColumn("bucket", lsh_bucket(F.col("ivec"), dim, n_planes))
    qs = queries.select(F.col(query_id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qvec"))
    qs = qs.withColumn("bucket", lsh_bucket(F.col("qvec"), dim, n_planes))
    scored = (it.join(F.broadcast(qs), "bucket")
              .filter(F.col("item_id") != F.col("query_id"))
              .select("query_id", "item_id",
                      F.round(cosine(F.col("ivec"), F.col("qvec")), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("item_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "item_id", "cos_sim", "rank"))


def label_centroids(items: DataFrame, dim: int, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid, via posexplode → groupBy(label, dim) → avg.

    One shuffle keyed (label, dim) — at 100 TB this beats collecting
    vectors: partial aggregation (map-side combine) reduces each
    partition to |labels|×dim rows before the exchange.
    """
    exploded = items.select(
        label_col, F.posexplode(_as_double(F.col(vec_col)))
        .alias("dim_idx", "component"))
    return (exploded.groupBy(label_col, "dim_idx")
            .agg(F.round(F.avg("component"), 6).alias("centroid_component"),
                 F.count(F.lit(1)).alias("n_vectors")))


def embedding_near_dup_pairs(items: DataFrame, dim: int,
                             threshold: float = 0.95,
                             n_planes: int = 4, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold),
    LSH-bucketed so only same-bucket pairs are scored."""
    it = items.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("vec"))
    it = it.withColumn("bucket", lsh_bucket(F.col("vec"), dim, n_planes))
    a, b = it.alias("a"), it.alias("b")
    return (a.join(b, "bucket")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6)
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
            .distinct())

"""Entity linking: free-text labels → canonical entity URIs.

Two-phase lookup-join, the Spark restatement of the reference's
``lookup_resource`` (/root/reference/ferenda/documentrepository.py:
500-547): exact match on the entity label first, then a fuzzy pass
with ``difflib.get_close_matches(cutoff=0.8)`` top-1 for the misses.

Phase 1 is a **broadcast** equi-join (the entity dimension is
broadcast-sized — it mirrors ferenda's commondata extra/*.ttl files).
Phase 2 confines the expensive fuzzy matching to exact-miss *distinct
labels only*, computed in one Arrow-batched pandas UDF — never a
crossJoin of full data.  Two guards keep that phase bounded on
open-domain text, where distinct miss labels grow with the corpus:

* **Length-band blocking** — difflib's ratio is 2M/(|a|+|b|) with
  M ≤ min(|a|,|b|), so a candidate within ``cutoff`` c of a miss of
  length L must have length in [L·c/(2-c), L·(2-c)/c]; comparing
  only entities inside that band is *provably lossless* (the pruned
  pool is a superset of every candidate that can reach the cutoff,
  and get_close_matches' (ratio, label) tie-break is order-free), so
  links are byte-identical to the unblocked pass while the per-miss
  cost drops from O(entities) to O(band).
* **Miss cap** — at most ``max_fuzzy_misses`` distinct miss labels
  (deterministically the lexicographically smallest) go through the
  fuzzy pass; the overflow count is logged, never silent. Capped-out
  labels stay unlinked (entity_uri null), the same result as a miss.
"""

from __future__ import annotations

import difflib
import math
import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.text import normalize_space_col

#: link_labels collects the entity dim to the driver for the difflib
#: pass — cap it at a comfortably-broadcastable size.
_MAX_ENTITY_DIM = 1_000_000


def link_labels(mentions: DataFrame, entities: DataFrame,
                label_col: str = "label",
                cutoff: float = 0.8,
                max_fuzzy_misses: int = 100_000) -> DataFrame:
    """mentions(..., label) → mentions + ``entity_uri`` (null if unlinkable).

    ``entities`` must have (uri, label). Any extra mention columns pass
    through untouched.
    """
    # ONE deterministic uri per normalized label: duplicate labels in
    # the dim would fan out exact-join rows (duplicate triples) and
    # make the fuzzy dict's winner collection-order-dependent
    ent = (entities.select(F.col("uri").alias("entity_uri"),
                           normalize_space_col(F.col("label"))
                           .alias("_elabel"))
           .filter(F.col("_elabel").isNotNull())
           .groupBy("_elabel")
           .agg(F.min("entity_uri").alias("entity_uri")))

    m = mentions.withColumn("_mlabel", normalize_space_col(F.col(label_col)))
    # null labels have no join key and would reach the fuzzy UDF as
    # None (len(None) crash): route them straight to unlinked output
    null_m = (m.filter(F.col("_mlabel").isNull()).drop("_mlabel")
              .withColumn("entity_uri", F.lit(None).cast("string")))
    m = m.filter(F.col("_mlabel").isNotNull())
    # hits, misses, and the miss count all branch off this join —
    # persist it so the upstream mention plan runs once, not thrice
    from pyspark import StorageLevel
    exact = (m.join(F.broadcast(ent), m["_mlabel"] == ent["_elabel"],
                    "left")
             .persist(StorageLevel.MEMORY_AND_DISK))

    hits = (exact.filter(F.col("entity_uri").isNotNull())
            .drop("_elabel", "_mlabel"))
    misses = exact.filter(F.col("entity_uri").isNull()).drop(
        "entity_uri", "_elabel")

    # Fuzzy phase over DISTINCT miss labels only. The entity dim is
    # contract-bound to broadcast size (ferenda's commondata files are
    # a few thousand resources); enforce it so a misuse with a huge
    # dim fails loudly instead of OOMing the driver.
    ent_rows = ent.limit(_MAX_ENTITY_DIM + 1).collect()
    if len(ent_rows) > _MAX_ENTITY_DIM:
        raise ValueError(
            f"link_labels: entity dimension exceeds the broadcast "
            f"contract ({_MAX_ENTITY_DIM} distinct rows); partition "
            f"the entity set or use a join-based linker instead")
    labels = sorted({r["_elabel"] for r in ent_rows})
    uri_by_label = {r["_elabel"]: r["entity_uri"] for r in ent_rows}
    # blocking index: label length → sorted labels of that length
    by_len: dict[int, list[str]] = {}
    for lab in labels:
        by_len.setdefault(len(lab), []).append(lab)
    lo_f = cutoff / (2.0 - cutoff)
    hi_f = (2.0 - cutoff) / cutoff

    distinct_miss = misses.select("_mlabel").distinct()
    n_miss = distinct_miss.count()  # one scalar; gates the cap
    if n_miss > max_fuzzy_misses:
        print(f"link_labels: fuzzy phase capped at {max_fuzzy_misses} "
              f"of {n_miss} distinct miss labels "
              f"({n_miss - max_fuzzy_misses} left unlinked)",
              file=sys.stderr)
        distinct_miss = (distinct_miss.orderBy("_mlabel")
                         .limit(max_fuzzy_misses))

    def fuzzy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for lab in pdf["_mlabel"]:
                # floor/ceil widen the band by <1 either side so
                # float rounding can never exclude an exact-boundary
                # candidate (the superset property is what makes the
                # blocking lossless)
                lo = max(0, math.floor(len(lab) * lo_f))
                hi = math.ceil(len(lab) * hi_f)
                cands = [c for ln in range(lo, hi + 1)
                         for c in by_len.get(ln, ())]
                best = difflib.get_close_matches(lab, cands, n=1,
                                                 cutoff=cutoff)
                out.append({"_mlabel": lab,
                            "entity_uri": uri_by_label[best[0]]
                            if best else None})
            yield pd.DataFrame(out, columns=["_mlabel", "entity_uri"])

    fuzzy_map = distinct_miss.mapInPandas(
        fuzzy, schema="_mlabel string, entity_uri string")

    # no broadcast hint: fuzzy_map is bounded by max_fuzzy_misses but
    # AQE sees the real size and picks the join strategy
    fuzzy_hits = (misses.join(fuzzy_map, "_mlabel", "left")
                  .drop("_mlabel"))
    return hits.unionByName(fuzzy_hits).unionByName(null_m)


def publisher_triples(extracted: DataFrame, entities: DataFrame) -> DataFrame:
    """(url, header.Publisher) → dcterms:publisher edges for linkable labels."""
    mentions = (extracted.filter(F.col("is_doc"))
                .select("url", F.col("header")["Publisher"].alias("label"))
                .filter(F.col("label").isNotNull()))
    linked = link_labels(
        mentions, entities.filter(F.col("kind") == "publisher"))
    return (linked.filter(F.col("entity_uri").isNotNull())
            .select(F.col("url").alias("subj"),
                    F.lit("dcterms:publisher").alias("pred"),
                    F.col("entity_uri").alias("obj"),
                    F.lit(False).alias("obj_is_literal"),
                    F.lit(None).cast("string").alias("obj_datatype"),
                    F.lit(None).cast("string").alias("obj_lang")))

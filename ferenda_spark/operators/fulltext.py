"""Fulltext search: fielded inverted index + boost-ranked queries.

The Spark restatement of the reference's fulltext engine
(/root/reference/ferenda/fulltextindex.py:395-470 ``update`` indexes
per-field documents with schema-declared boosts; :685-745 ``query``
runs boosted fielded search; documentrepository.py:2150-2250
``relate_fulltext`` feeds title/identifier/text per document).

Spark-first design — the index is a DataFrame, not a server:

* ``fulltext_index``: one row per (term, field, doc) with term
  frequency; built map-side (tokenize → explode) with ONE shuffle on
  the (term, field, doc) group key.  At 100 TB the index table is
  written bucketed by term so query-time term lookups prune buckets
  instead of scanning.
* ``idf_milli``: per-term inverse document frequency, pre-scaled to
  an integer (floor(1000·ln(N/df))) so scores are BIGINT arithmetic —
  deterministic across engines, no float-sum ordering hazards.
* ``fulltext_search``: filter the index to the query terms (a tiny
  IN-list the optimizer pushes into the scan), join the broadcast
  idf table, score = Σ tf·boost·idf_milli per doc, top-k by
  (score desc, doc asc).  Field boosts mirror the reference's
  ``boost``-annotated schema fields (fulltextindex.py:117-140).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _field_tokens(col) -> "F.Column":
    """Lowercased whitespace tokens (the index analyzer)."""
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"),
                    lambda t: t != "")


def fulltext_index(docs: DataFrame, id_col: str,
                   fields: dict[str, int]) -> DataFrame:
    """(term, field, boost, id, tf) rows — the inverted index.

    ``fields`` maps field column → integer boost (the reference's
    boosted schema fields, e.g. label=16, creator=4, text=1).
    """
    parts = []
    for fld, boost in fields.items():
        parts.append(
            docs.select(F.col(id_col).alias("id"),
                        F.explode(_field_tokens(F.col(fld))).alias("term"))
            .withColumn("field", F.lit(fld))
            .withColumn("boost", F.lit(boost).cast("long")))
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)
    return (rows.groupBy("term", "field", "boost", "id")
            .agg(F.count(F.lit(1)).alias("tf")))


def idf_milli(index: DataFrame, n_docs: int) -> DataFrame:
    """Per-term integer idf: floor(1000·ln(N/df)), df = docs containing
    the term in ANY field. Broadcast-sized (vocabulary table)."""
    return (index.groupBy("term")
            .agg(F.countDistinct("id").alias("df"))
            .select("term", F.floor(
                F.log(F.lit(float(n_docs)) / F.col("df")) * 1000
            ).cast("long").alias("idf_milli")))


def fulltext_search(index: DataFrame, idf: DataFrame,
                    query_terms: list[str], k: int = 20) -> DataFrame:
    """Boost-ranked fielded search: (id, score, rank), top-k.

    Score = Σ over matched (term, field) of tf·boost·idf_milli —
    BIGINT end-to-end. The term filter is an IN-list pushed to the
    index scan; the idf table is broadcast.

    Query terms run through the SAME analyzer as indexing (the
    reference analyzes queries with the index analyzer,
    fulltextindex.py query path) — a raw 'Table' must match indexed
    'table', and a multi-word query string is split like a field."""
    analyzed = sorted({t for q in query_terms
                       for t in q.lower().split() if t})
    hits = index.filter(F.col("term").isin(*analyzed))
    scored = (hits.join(F.broadcast(idf), "term")
              .groupBy("id")
              .agg(F.sum(F.col("tf") * F.col("boost")
                         * F.col("idf_milli")).alias("score")))
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

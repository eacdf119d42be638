"""ferenda_spark — a PySpark-native knowledge-graph construction engine.

A brand-new implementation (NOT a port) of the query / data-processing
capabilities of the reference framework maxreimerson/ferenda: document
text extraction, citation/mention recognition, entity linking,
URI-minting canonicalization, and graph materialization with lineage
and resumability — re-expressed as a pyspark.sql DataFrame +
pandas/Arrow-UDF DAG over a table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` producing graph tables
``(node, edge, provenance)``.

Design notes
------------
* Everything is declarative DataFrame / SQL so Catalyst handles
  predicate pushdown, column pruning, join planning and AQE.
* Python only runs inside Arrow-batched ``mapInPandas`` /
  ``pandas_udf`` stages (HTML parse, per-document stateful grammars);
  never per-row Python at the API layer.
* Joins against small dimension tables (entities, URI templates,
  slug maps) are always ``F.broadcast``; the one genuinely large join
  (citation target resolution) is an equi-join with AQE skew
  handling plus an optional hot-key salting path.
"""

__version__ = "0.1.0"

from ferenda_spark.session import get_spark  # noqa: F401

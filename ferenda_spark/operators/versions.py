"""Document version archive: latest-version view + as-of lookup.

The Spark restatement of the reference's version archiving
(/root/reference/ferenda/documentstore.py:781-820 ``archive`` moves
the current version under ``archive/<basefile>/<version>`` before a
new one lands; sources/legal/se/sfs.py:425-472 consolidated statutes
carry in-effect dates and readers ask for "the version in effect at
date D" — TemporalElement semantics).

Relational form: a ``versions`` table (url, version, valid_from,
archive_uri) where exactly one row per url is current.  Both views
are one window over one shuffle on url:

* ``latest_versions`` — the current snapshot per document.
* ``versions_asof`` — the version in effect at a given date
  (valid_from ≤ D, latest such).  Documents with no version yet in
  effect at D drop out (the reference raises/skips for
  not-yet-published basefiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.text import natural_sort_key_col


def latest_versions(versions: DataFrame, key: str = "url",
                    ts: str = "valid_from") -> DataFrame:
    """One row per document: its current version (max valid_from,
    version ordinal as tiebreak — NATURAL order, so 'v10' outranks
    'v9'), plus the version count."""
    w = Window.partitionBy(key).orderBy(
        F.desc(ts), F.desc(natural_sort_key_col(F.col("version"))))
    counts = Window.partitionBy(key)
    return (versions
            .withColumn("n_versions", F.count(F.lit(1)).over(counts))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def versions_asof(versions: DataFrame, at, key: str = "url",
                  ts: str = "valid_from") -> DataFrame:
    """The version of each document in effect at date ``at``."""
    w = Window.partitionBy(key).orderBy(
        F.desc(ts), F.desc(natural_sort_key_col(F.col("version"))))
    return (versions
            .filter(F.col(ts) <= F.lit(at))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))

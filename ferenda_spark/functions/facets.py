"""Declarative facet schema — the reference's per-repo ``facets()``
system as Column selectors.

A Facet simultaneously drives the SELECT projection, grouping
dimension, and statistics in the reference
(/root/reference/ferenda/facet.py:17-423; facet_query
documentrepository.py:2290-2380; fulltext field types
fulltextindex.py:232-305). Here each facet is (rdf predicate →
selector Column), compiled into one wide projection +
grouping-sets statistics pass.

Selector functions mirror facet.py's: ``year`` (:157), ``firstletter``
(:213), identity; ``slug`` identificator (:142-156).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.text import slugify_col


# -- selector library (facet.py:129-347) ------------------------------------

def sel_identity(c: Column) -> Column:
    return c


def sel_year(c: Column) -> Column:
    """First 4 chars of an ISO-ish date literal → year (facet.py:157)."""
    return F.substring(c, 1, 4)


def sel_firstletter(c: Column) -> Column:
    """First sortable letter of a title (facet.py:213)."""
    return F.substring(F.lower(F.trim(c)), 1, 1)


def sel_slug(c: Column) -> Column:
    return slugify_col(c)


SELECTORS: dict[str, Callable[[Column], Column]] = {
    "identity": sel_identity,
    "year": sel_year,
    "firstletter": sel_firstletter,
    "slug": sel_slug,
}


@dataclass
class Facet:
    """``pred`` is the long qname column source, ``selector`` a
    SELECTORS key.  ``rdftype`` (optional) guards the facet to
    subjects of that type — the reference's per-facet rdftype FILTER
    in facet_query (documentrepository.py:2290-2380): in a multi-type
    graph a bibo:Standard facet must not pick up bibo:Report values.
    """
    pred: str
    selector: str = "identity"
    name: str | None = None
    rdftype: str | None = None

    @property
    def colname(self) -> str:
        base = self.pred.split(":")[-1]
        return self.name or (base if self.selector == "identity"
                             else f"{base}_{self.selector}")


def faceted_data(edges: DataFrame, facets: list[Facet],
                 types: list[str] | None = None) -> DataFrame:
    """Long triples → one row per subject with one selector column per
    facet (the reference's cached faceted_data(),
    documentrepository.py:2232-2288). One groupBy — no per-facet
    scans.

    ``types`` restricts rows to subjects whose rdf:type is in the
    list (the multi-repo ``FILTER (?type IN ...)`` of facet_query);
    per-facet ``rdftype`` guards null out values on other types.
    Both guards ride the same single aggregation pass.
    """
    # the type guard keeps the SET of types — RDF subjects are
    # routinely multi-typed, and max() would test guards against one
    # arbitrary type (facet_query FILTERs against any matching type)
    raw_aggs = [F.collect_set(F.when(F.col("pred") == "rdf:type",
                                     F.col("obj"))).alias("_rdftypes")]
    for f in facets:
        raw_aggs.append(
            F.max(F.when(F.col("pred") == f.pred, F.col("obj")))
            .alias(f"_raw_{f.colname}"))
    wide = edges.groupBy(F.col("subj").alias("uri")).agg(*raw_aggs)
    if types:
        wide = wide.filter(F.arrays_overlap(
            F.col("_rdftypes"), F.array(*[F.lit(t) for t in types])))
    outcols = [F.col("uri")]
    for f in facets:
        sel = SELECTORS[f.selector]
        val = sel(F.col(f"_raw_{f.colname}"))
        if f.rdftype:
            val = F.when(F.array_contains(F.col("_rdftypes"),
                                          f.rdftype), val)
        outcols.append(val.alias(f.colname))
    return wide.select(*outcols)


def facet_statistics(edges: DataFrame, facets: list[Facet],
                     types: list[str] | None = None) -> DataFrame:
    """Distinct-document counts per facet value for every facet in ONE
    grouping-sets pass (the API stats endpoint, wsgiapp.py:232-386;
    the reference loops facets in Python — grouping sets is the free
    upgrade SURVEY §2.4 notes). Output: (facet, value, n)."""
    wide = faceted_data(edges, facets, types)
    cols = [f.colname for f in facets]
    # the grouping-set marker must be computed inside agg() —
    # grouping() is only valid under GroupingSets/Cube/Rollup; via
    # grouping() the attribution survives value-null rows (subjects
    # lacking the predicate)
    facet_name = F.coalesce(*[
        F.when(F.grouping(c) == 0, F.lit(c)) for c in cols])
    gs = (wide.groupingSets([[c] for c in cols], *[F.col(c) for c in cols])
          .agg(F.count(F.lit(1)).alias("n"),
               facet_name.alias("facet")))
    value = F.coalesce(*[F.col(c) for c in cols])
    return (gs.select("facet", value.alias("value"), "n")
            .filter(F.col("facet").isNotNull()))

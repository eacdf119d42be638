"""Fused single-pass triple construction — the optimized execution of
the modular pipeline.

The modular DAG (metadata ∪ sections ∪ citations ∪ publisher over a
persisted extract) is the *specification*: composable operators, each
independently testable. At scale its persist barrier + four cache
scans + union dominate wall time. This module emits the IDENTICAL
triple set in one map-only pass:

    scan → mapInPandas extract (publisher linking folded in)
         → one wide Column expression building every per-document
           triple array → concat → explode → project

Zero shuffles, zero caches, zero joins — the whole job is two codegen
stages, so throughput scales with cores until input bandwidth. Both
paths are verified against the same ANSI-SQL oracle and golden triple
sets (kg_edges / kg_edges_modular gate queries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import BASE, MONTHS
from ferenda_spark.grammar.citations import (
    alias_map,
    cite_objs,
    stateful_reference_structs,
)
from ferenda_spark.operators.metadata import _CATEGORY_TYPE_ITEMS, _triple

_EMPTY = "array<struct<subj:string,pred:string,obj:string," \
         "obj_is_literal:boolean,obj_datatype:string,obj_lang:string>>"


def _when_arr(cond: Column, arr: Column) -> Column:
    return F.when(cond, arr).otherwise(F.array().cast(_EMPTY))


def _cite_structs(subj: Column, text: Column, aliases: Column) -> Column:
    """Shared multi-class grammar (grammar/citations.py) — the fused
    and modular plans consume the same registry, so a new citation
    class lands in both executions by construction."""
    return F.transform(
        cite_objs(text, aliases),
        lambda obj: F.struct(
            subj.alias("subj"),
            F.lit("dcterms:references").alias("pred"),
            obj.alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang")))


def fused_triples(ext: DataFrame) -> DataFrame:
    """Extracted docs (with publisher_uri) → the full triple set."""
    docs = ext.filter(F.col("is_doc"))

    month_map = F.create_map(
        *[x for m, i in zip(MONTHS, range(1, 13))
          for x in (F.lit(m), F.lit(f"{i:02d}"))])
    cat_type = F.create_map(
        *[x for k, v in _CATEGORY_TYPE_ITEMS for x in (F.lit(k), F.lit(v))])

    uri = F.col("url")
    header = F.col("header")
    category = header["Category"]
    date = header["Date"]
    issued = F.concat(
        F.regexp_extract(date, r" (\d{4})$", 1), F.lit("-"),
        month_map[F.regexp_extract(date, r"^(\w+) ", 1)])
    subject_uri = F.concat(
        F.lit(BASE + "res/category/"),
        F.replace(F.lower(category), F.lit(" "), F.lit("-")))

    doc_arr = F.array(
        _triple(uri, "rdf:type",
                F.coalesce(cat_type[category], F.lit("bibo:Report"))),
        _triple(uri, "dcterms:title", F.col("title"),
                literal=True, lang=F.col("lang")),
        _triple(uri, "dcterms:identifier",
                F.concat(F.lit("RFC "), header["Request for Comments"]),
                literal=True),
        _triple(uri, "dcterms:issued", issued, literal=True,
                datatype="xsd:gYearMonth"),
        _triple(uri, "dcterms:subject", subject_uri),
    )
    pub_arr = _when_arr(
        F.col("publisher_uri").isNotNull(),
        F.array(_triple(uri, "dcterms:publisher", F.col("publisher_uri"))))

    def rel_arr(key: str, pred: str) -> Column:
        vals = header[key]
        return _when_arr(
            vals.isNotNull(),
            F.transform(
                F.split(vals, ", "),
                lambda num: _triple(uri, pred,
                                    F.concat(F.lit(BASE + "res/rfc/"),
                                             num))))

    # per-section fragment triples (metadata.section_triples semantics)
    def sec_structs(sec: Column) -> Column:
        frag = F.concat(uri, F.lit("#S"), sec["ordinal"])
        parent = F.when(
            sec["ordinal"].contains("."),
            F.concat(uri, F.lit("#S"),
                     F.regexp_replace(sec["ordinal"], r"\.\d+$", "")),
        ).otherwise(uri)
        return F.array(
            _triple(frag, "rdf:type", F.lit("bibo:DocumentPart")),
            _triple(frag, "bibo:chapter", sec["ordinal"], literal=True),
            _triple(frag, "dcterms:isPartOf", parent),
            _triple(frag, "dcterms:title", sec["heading"],
                    literal=True, lang=F.col("lang")),
        )

    aliases = alias_map(F.col("text"))

    sec_arr = F.flatten(F.transform(F.col("sections"), sec_structs))
    sec_cites = F.flatten(F.transform(
        F.col("sections"),
        lambda sec: _cite_structs(
            F.concat(uri, F.lit("#S"), sec["ordinal"]),
            sec["text"], aliases)))
    pre_cites = _cite_structs(uri, F.col("preamble"), aliases)
    # stateful short-form refs ("Section N of that document"):
    # the currentlaw-analog fold stays inside the same map-only stage
    state_cites = F.transform(
        stateful_reference_structs(uri, F.col("preamble"),
                                   F.col("sections"), aliases),
        lambda r: _triple(r["frag"], "dcterms:references", r["obj"]))

    all_triples = F.concat(doc_arr, pub_arr,
                           rel_arr("Updates", "rfc:updates"),
                           rel_arr("Obsoletes", "rfc:obsoletes"),
                           sec_arr, sec_cites, pre_cites, state_cites)

    return (docs
            .select(F.explode(all_triples).alias("t"))
            .select("t.*")
            .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull()
                    & (F.col("obj") != "")))

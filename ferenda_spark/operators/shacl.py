"""SHACL-lite shape validation over an edge table.

A distributed subset of W3C SHACL core (https://www.w3.org/TR/shacl/):
shapes target a class (``sh:targetClass``) and constrain one property
path each with ``sh:minCount`` / ``sh:maxCount`` / ``sh:nodeKind``
(IRI or Literal) / ``sh:datatype``.  The validator returns a
violation report — one row per (focus node, shape, violated
constraint), mirroring ``sh:ValidationResult`` — instead of throwing,
so a 100 TB graph can be graded and the bad slice quarantined.

The reference relies on its external triplestores to reject malformed
data and on per-repo required-predicate conventions
(/root/reference/ferenda/documentrepository.py required_predicates);
this makes the same contract a first-class, declarative, distributed
check.

Scale shape: shapes are a tiny dimension (broadcast).  Targets =
typed nodes of the shape's class; the single big operation is one
join of the edge table against the (focus, path) target set keyed on
(subj, pred) followed by one aggregation on the same key — Catalyst
plans both around a single exchange of the corpus-sized side.
minCount violations need a LEFT join (absent property = count 0), so
targets drive the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shape table DDL: one row = one property constraint of one shape
SHAPE_DDL = ("shape_id string, target_class string, path string, "
             "min_count bigint, max_count bigint, node_kind string, "
             "datatype string")

TYPE_PRED = "rdf:type"


def shacl_validate(edges: DataFrame, shapes: DataFrame,
                   type_pred: str = TYPE_PRED) -> DataFrame:
    """Validate ``edges`` against ``shapes`` (SHAPE_DDL rows).

    Returns the violation report: ``(focus, shape_id, path,
    constraint, actual, expected)`` with one row per violated
    constraint — ``constraint`` ∈ {minCount, maxCount, nodeKind,
    datatype}, ``actual`` the offending count (as string for the
    kind/datatype rows: the number of offending values), ``expected``
    the constraint's declared bound.  An empty result means the graph
    conforms."""
    sh = F.broadcast(shapes)
    targets = (edges.filter(F.col("pred") == type_pred)
               .select(F.col("subj").alias("focus"),
                       F.col("obj").alias("target_class"))
               .distinct()
               .join(sh, "target_class"))
    vals = edges.select(F.col("subj").alias("focus"),
                        F.col("pred").alias("path"),
                        "obj", "obj_is_literal", "obj_datatype")
    joined = targets.join(vals, ["focus", "path"], "left")
    kind_bad = F.when(
        F.col("node_kind").isNotNull() & F.col("obj").isNotNull(),
        F.when((F.col("node_kind") == "IRI") & F.col("obj_is_literal"),
               1).when((F.col("node_kind") == "Literal")
                       & ~F.col("obj_is_literal"), 1).otherwise(0)
    ).otherwise(0)
    dt_bad = F.when(
        F.col("datatype").isNotNull() & F.col("obj").isNotNull()
        & ~F.col("obj_datatype").eqNullSafe(F.col("datatype")),
        1).otherwise(0)
    agg = (joined.groupBy("focus", "shape_id", "path", "min_count",
                          "max_count", "node_kind", "datatype")
           .agg(F.count("obj").alias("n_values"),
                F.sum(kind_bad).alias("n_kind_bad"),
                F.sum(dt_bad).alias("n_dt_bad")))

    # the four constraint reports come from ONE pass over agg (a
    # per-row array of optional violation structs, compacted and
    # exploded) — a UNION of four filters would re-execute the
    # corpus-sized join + aggregation once per arm
    def v(cond, constraint, actual, expected):
        return F.when(cond, F.struct(
            F.lit(constraint).alias("constraint"),
            actual.cast("long").alias("actual"),
            expected.cast("string").alias("expected")))

    viols = F.filter(F.array(
        v(F.col("min_count").isNotNull()
          & (F.col("n_values") < F.col("min_count")),
          "minCount", F.col("n_values"), F.col("min_count")),
        v(F.col("max_count").isNotNull()
          & (F.col("n_values") > F.col("max_count")),
          "maxCount", F.col("n_values"), F.col("max_count")),
        v(F.col("n_kind_bad") > 0, "nodeKind",
          F.col("n_kind_bad"), F.col("node_kind")),
        v(F.col("n_dt_bad") > 0, "datatype",
          F.col("n_dt_bad"), F.col("datatype")),
    ), lambda x: x.isNotNull())
    return (agg.select("focus", "shape_id", "path",
                       F.explode(viols).alias("v"))
            .select("focus", "shape_id", "path", "v.constraint",
                    "v.actual", "v.expected"))


def conforms(edges: DataFrame, shapes: DataFrame,
             type_pred: str = TYPE_PRED) -> bool:
    """``sh:conforms`` — True iff the report is empty."""
    return shacl_validate(edges, shapes, type_pred).isEmpty()

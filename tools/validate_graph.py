"""spark-submit graph quality gate: VoID statistics + SHACL-lite
validation over a committed GraphStore — the "is the graph sane
before anyone queries it" step the reference delegates to its
triplestore's schema checks and its status reports
(/root/reference/ferenda/devel.py statusreport,
documentrepository.py required_predicates).

Usage:
    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/validate_graph.py <store_dir> [--table edge] \
        [--shapes shapes.tsv] [--report-out DIR] [--void-out DIR] \
        [--approximate]

Always prints one VOID_STATS line (dataset summary).  With --shapes
(a TSV of shape_id, target_class, path, min_count, max_count,
node_kind, datatype; empty field = unconstrained) it validates and
prints one SHACL_STATS line; --report-out writes the full violation
report as parquet, --void-out writes the VoID description as
N-Triples next to the data.  Exit code 1 iff shapes were given and
the graph does not conform — so a pipeline can gate promotion on it.
"""

import argparse
import sys

from pyspark.sql import SparkSession


def parse_shapes_file(path: str) -> list[tuple]:
    """One shape per line, tab-separated, ``#`` comments allowed;
    empty min/max/node_kind/datatype fields mean unconstrained."""
    shapes = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 7:
                raise ValueError(
                    f"{path}:{ln}: expected 7 tab-separated fields "
                    f"(shape_id, target_class, path, min_count, "
                    f"max_count, node_kind, datatype), got {len(parts)}")
            sid, cls, pth, mn, mx, kind, dt = (p.strip() for p in parts)
            if kind and kind not in ("IRI", "Literal"):
                raise ValueError(f"{path}:{ln}: node_kind must be IRI "
                                 f"or Literal, got {kind!r}")
            shapes.append((sid, cls, pth,
                           int(mn) if mn else None,
                           int(mx) if mx else None,
                           kind or None, dt or None))
    if not shapes:
        raise ValueError(f"{path}: no shapes found")
    return shapes


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="validate_graph")
    p.add_argument("store_dir")
    p.add_argument("--table", default="edge")
    p.add_argument("--shapes", default=None,
                   help="TSV shapes file; validation runs only if given")
    p.add_argument("--report-out", default=None,
                   help="write the violation report as parquet here")
    p.add_argument("--void-out", default=None,
                   help="write the VoID description as N-Triples here")
    p.add_argument("--dataset-uri", default="https://example.org/void",
                   help="dataset IRI for the VoID description")
    p.add_argument("--approximate", action="store_true",
                   help="HyperLogLog distinct counts (the 10^12 path)")
    args = p.parse_args(argv)
    if args.report_out and not args.shapes:
        p.error("--report-out requires --shapes (nothing would be "
                "written and the graph would look validated when no "
                "validation ran)")
    return args


def run(spark: SparkSession, argv: list[str]) -> dict:
    from ferenda_spark.operators import shacl, voidstats
    from ferenda_spark.operators.graph import GraphStore

    args = _parse_args(argv)
    store = GraphStore(spark, args.store_dir)
    edges = store.read_current(args.table).persist()
    s = voidstats.dataset_summary(edges,
                                  approximate=args.approximate).collect()[0]
    print(f"VOID_STATS table={args.table} triples={s['n_triples']} "
          f"subjects={s['n_subjects']} objects={s['n_objects']} "
          f"properties={s['n_properties']} classes={s['n_classes']}")
    if args.void_out:
        from ferenda_spark.sources.rdf_serial import write_ntriples
        write_ntriples(
            voidstats.void_triples(edges, args.dataset_uri,
                                   approximate=args.approximate),
            args.void_out)
        print(f"VOID_OUT {args.void_out}")

    result = {"triples": s["n_triples"], "violations": None}
    conforms = True
    if args.shapes:
        shape_rows = parse_shapes_file(args.shapes)
        shapes = spark.createDataFrame(shape_rows, shacl.SHAPE_DDL)
        report = shacl.shacl_validate(edges, shapes).persist()
        n_viol = report.count()
        conforms = n_viol == 0
        by_kind = {r["constraint"]: r["n"] for r in
                   report.groupBy("constraint").count()
                   .withColumnRenamed("count", "n").collect()}
        print(f"SHACL_STATS shapes={len(shape_rows)} "
              f"violations={n_viol} conforms={conforms} "
              f"by_kind={by_kind}")
        if args.report_out:
            report.write.mode("overwrite").parquet(args.report_out)
            print(f"REPORT_OUT {args.report_out}")
        report.unpersist()
        result["violations"] = n_viol
    edges.unpersist()
    if args.shapes and not conforms:
        raise SystemExit(1)
    return result


if __name__ == "__main__":
    spark = SparkSession.builder.getOrCreate()
    run(spark, sys.argv[1:])

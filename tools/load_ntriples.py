"""spark-submit N-Triples dump → GraphStore bulk load — the
``add_serialized_file(..., format="nt")`` analog (reference
triplestore.py:135, 1855): the standard interchange format in, a
committed snapshot out.

Usage:
    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/load_ntriples.py <nt_dir_or_file> <store_dir> \
        [--table edge] [--base-iri IRI] [--max-error-rate 0.01]

The parse is one distributed pass (pure column expressions; .gz
splits per file); malformed lines become error rows, and the load
REFUSES to commit when their fraction exceeds ``--max-error-rate`` —
a mostly-garbage dump is an operational fault, not data.  IRIs are
contracted to the store's CURIE vocabulary (STD_PREFIXES +
``--base-iri``), matching what export_ntriples.py expands on the way
out, so load(export(store)) is row-identical.

Prints one LOAD_STATS line (grep ^LOAD_STATS).
"""

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="load_ntriples")
    p.add_argument("nt_path")
    p.add_argument("store_dir")
    p.add_argument("--table", default="edge")
    p.add_argument("--base-iri", default=None)
    p.add_argument("--max-error-rate", type=float, default=0.01,
                   help="refuse to commit when more than this "
                        "fraction of non-comment lines fail to parse")
    p.add_argument("--partition-by", default=None,
                   help="comma-separated partition columns for the "
                        "target table (e.g. 'pred' — matches a store "
                        "created with partition_spec so loaded "
                        "snapshots keep pruning at planning time)")
    return p.parse_args(argv)


def run(spark: SparkSession, argv: list[str]) -> dict:
    from ferenda_spark.operators.graph import GraphStore
    from ferenda_spark.sources.rdf_serial import (
        STD_PREFIXES,
        read_ntriples,
    )

    args = _parse_args(argv)
    prefixes = dict(STD_PREFIXES)
    if args.base_iri:
        prefixes[""] = args.base_iri
    parsed = read_ntriples(spark, args.nt_path, prefixes).persist()
    n_err = parsed.filter(F.col("error").isNotNull()).count()
    n_all = parsed.count()
    n_ok = n_all - n_err
    if n_all == 0:
        parsed.unpersist()
        raise SystemExit(
            f"load_ntriples: {args.nt_path} contains no triple lines "
            "(empty dump, or only comments/blanks) — nothing to load")
    rate = n_err / n_all
    if rate > args.max_error_rate:
        sample = [r["error"] for r in
                  parsed.filter(F.col("error").isNotNull())
                  .select("error").head(3)]
        parsed.unpersist()
        raise SystemExit(
            f"load_ntriples: {n_err}/{n_all} lines failed to parse "
            f"(rate {rate:.4f} > {args.max_error_rate}); first "
            f"errors: {sample}")
    spec = {args.table: args.partition_by.split(",")} \
        if args.partition_by else None
    store = GraphStore(spark, args.store_dir, partition_spec=spec)
    snap = store.append(
        parsed.filter(F.col("error").isNull()).drop("error"),
        args.table)
    parsed.unpersist()
    print(f"LOAD_STATS table={args.table} triples={n_ok} "
          f"error_lines={n_err} snapshot={snap}")
    return {"triples": n_ok, "error_lines": n_err}


if __name__ == "__main__":
    spark = SparkSession.builder.getOrCreate()
    run(spark, sys.argv[1:])

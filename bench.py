"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

--scaling: run the KG pipeline on the same synthetic corpus at two
parallelism levels (N=8 and 4N=32 cores, fresh JVM each) and report
triples/sec at both plus efficiency = (tp_4N / tp_N) / 4 — the
sandbox substitution for the N→4N-executor cluster criterion
(BASELINE.md). Results appended to BENCH.md.

--kg-worker CPUS PAGES_DIR: internal subprocess entry for --scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "kg_edges",
    "kg_citations_by_target",
    "kg_closure",
    "q1_pricing",
    "q5_local_supplier",
    "topk_orders",
    "facet_stats_cube",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "text_token_stats",
    "text_langid",
    "media_meta",
    "sessionize_events",
    "asof_purchase_click",
    "streaming_hourly_events",
    "salted_join_suppliers",
]


def _spark(cpus: int):
    from ferenda_spark.session import get_spark
    return get_spark(app_name="ferenda-bench", master=f"local[{cpus}]",
                     shuffle_partitions=max(cpus, 8))


def _force(df) -> int:
    """Force full computation of every output column (count() alone
    lets Catalyst prune computed columns away)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_default() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import __spark_entry__ as entry_mod
    spark = _spark(cpus)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    kg_triples = 0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name == "kg_edges":
            kg_triples = df.count()
        else:
            _force(df)
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    kg_tps = round(kg_triples / timings["kg_edges"], 1) if kg_triples else 0
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "kg_triples": kg_triples,
        "kg_triples_per_sec": kg_tps,
    }))


def run_kg_worker(cpus: int, pages_dir: str) -> None:
    """Time the full KG pipeline (read → extract → mention → link →
    mint → dedup → count) on a pre-generated pages parquet."""
    from pyspark.sql import functions as F  # noqa: F401
    from ferenda_spark.fixtures.pages import entities_df
    from ferenda_spark.pipeline import build_triples
    spark = _spark(cpus)
    pages = spark.read.parquet(pages_dir)
    ents = entities_df(spark)
    # Warm up with one FULL run: JIT, Janino codegen, Python worker
    # pool — all one-time costs a long-running cluster job amortizes.
    # Then drop every cache so the timed run re-does all real work.
    build_triples(pages, ents).count()
    spark.catalog.clearCache()
    t0 = time.time()
    n = build_triples(pages, ents).count()
    sec = time.time() - t0
    print(json.dumps({"cpus": cpus, "triples": n, "sec": round(sec, 3),
                      "triples_per_sec": round(n / sec, 1)}))


def run_scaling(n_docs: int = 40000) -> None:
    pages_dir = f"/tmp/ferenda_bench_pages_{n_docs}"
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        from ferenda_spark.fixtures.pages import pages_df
        spark = _spark(16)
        pages_df(spark, n_docs, partitions=64).write.mode(
            "overwrite").parquet(pages_dir)
        spark.stop()

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--kg-worker",
             str(cpus), pages_dir],
            capture_output=True, text=True, check=True,
            env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"})
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    tp8 = results[8]["triples_per_sec"]
    tp32 = results[32]["triples_per_sec"]
    eff = round(tp32 / (4 * tp8), 3)
    report = {
        "metric": "kg_scaling_efficiency_N_to_4N",
        "value": eff,
        "unit": "ratio",
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run ({time.strftime('%Y-%m-%d %H:%M')} UTC)\n\n"
            f"Same job (full KG pipeline, {n_docs} synthetic pages, "
            f"{results[8]['triples']} triples), same input, two "
            f"parallelism levels (sandbox substitution for N→4N "
            f"executors):\n\n"
            f"| level | cores | wall (s) | triples/sec |\n"
            f"|---|---|---|---|\n"
            f"| N | 8 | {results[8]['sec']} | {tp8} |\n"
            f"| 4N | 32 | {results[32]['sec']} | {tp32} |\n\n"
            f"**Scaling efficiency = (tp_4N / tp_N) / 4 = {eff}** "
            f"(target ≥ 0.8)\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--kg-worker":
        run_kg_worker(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 2000)
    else:
        run_default()

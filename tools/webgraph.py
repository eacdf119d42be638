"""spark-submit webgraph analysis: page link edges in, the full graph
report out — one WEBGRAPH_STATS line per stage.

    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/webgraph.py <links_parquet> <out_dir> \
        [--wat] [--iters 3] [--seeds-min-indegree 5] [--top 20]

Input: a parquet of page-level link edges ``(src, dst)`` — or, with
``--wat``, a directory of WAT segments (``sources/warc.py::
links_from_wat``), so the report runs off the crawl-archive metadata
layer without touching raw HTML.  The chain, every stage an
independently oracle-gated operator:

  1. host-graph projection     (crawl.host_graph — eTLD-host edges)
  2. PageRank + TrustRank      (rank.pagerank / rank.trustrank;
                                seeds = hosts with in-degree ≥ K,
                                the whitelist stand-in; spam mass =
                                rank − trust)
  3. SCC + condensation levels (rank.scc / condensation /
                                topo_levels — link-farm cycles and
                                the processing order)
  4. assortativity             (rank.degree_assortativity — the
                                mixing diagnostic, r > 0 flags
                                mutual-promotion structure)

Outputs parquet tables under <out_dir>/{host_graph,ranks,scc,levels}
plus the printed stats; exits nonzero on an empty link table (a
report over nothing is a pipeline bug upstream, never a success).
This is the one-command webgraph analog of tools/curate.py.
"""

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _parse_args(argv):
    p = argparse.ArgumentParser(prog="webgraph")
    p.add_argument("links_in")
    p.add_argument("out_dir")
    p.add_argument("--wat", action="store_true",
                   help="links_in is a directory of WAT segments, "
                        "not a parquet of (src, dst)")
    p.add_argument("--iters", type=int, default=3,
                   help="PageRank/TrustRank iterations")
    p.add_argument("--seeds-min-indegree", type=int, default=5,
                   help="trust-seed threshold: hosts with at least "
                        "this in-degree seed TrustRank")
    p.add_argument("--top", type=int, default=20,
                   help="rows printed per ranking")
    return p.parse_args(argv)


def main(argv):
    args = _parse_args(argv)
    spark = SparkSession.builder.getOrCreate()
    from ferenda_spark.operators.crawl import host_graph
    from ferenda_spark.operators.rank import (condensation,
                                              degree_assortativity,
                                              pagerank, scc,
                                              topo_levels, trustrank)

    if args.wat:
        from ferenda_spark.sources.warc import links_from_wat, read_warc
        links = links_from_wat(read_warc(spark, args.links_in))
    else:
        links = spark.read.parquet(args.links_in).select("src", "dst")
    n_links = links.count()
    if n_links == 0:
        raise SystemExit("webgraph: empty link table — nothing to "
                         "report on")
    print(f"WEBGRAPH_STATS stage=links n={n_links}")

    hg = host_graph(links).localCheckpoint(eager=True)
    hg.write.mode("overwrite").parquet(args.out_dir + "/host_graph")
    n_hosts = (hg.select(F.col("src_host").alias("h"))
               .unionByName(hg.select(F.col("dst_host").alias("h")))
               .distinct().count())
    print(f"WEBGRAPH_STATS stage=host_graph edges={hg.count()} "
          f"hosts={n_hosts}")

    he = hg.select(F.col("src_host").alias("src"),
                   F.col("dst_host").alias("dst"))
    pr = pagerank(he, iters=args.iters)
    seeds = (he.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= args.seeds_min_indegree)
             .select(F.col("dst").alias("node")))
    n_seeds = seeds.count()
    if n_seeds == 0:
        print("WEBGRAPH_STATS stage=trustrank skipped=True "
              "reason=no-seeds")
        ranks = pr.withColumn("trust_micro", F.lit(None).cast("long"))
    else:
        tr = trustrank(he, seeds, iters=args.iters)
        ranks = pr.join(tr, "node", "left")
        print(f"WEBGRAPH_STATS stage=trustrank seeds={n_seeds}")
    ranks = ranks.withColumn(
        "spam_mass_micro",
        F.col("rank_micro") - F.coalesce("trust_micro", F.lit(0)))
    ranks.write.mode("overwrite").parquet(args.out_dir + "/ranks")
    for row in (ranks.orderBy(F.desc("rank_micro"), F.asc("node"))
                .limit(args.top).collect()):
        print(f"WEBGRAPH_RANK host={row['node']} "
              f"rank={row['rank_micro']} trust={row['trust_micro']}")

    # scc/condensation run on BIGINT ids (their fixpoint arithmetic
    # contract): hosts map through the deterministic 64-bit hash and
    # back, comp label = the component's minimum-hash member's host
    hid = (he.select(F.col("src").alias("host"))
           .unionByName(he.select(F.col("dst").alias("host")))
           .distinct()
           .select("host", F.xxhash64("host").alias("hid"))
           .localCheckpoint(eager=True))
    he_ids = (he.join(hid.select(F.col("host").alias("src"),
                                 F.col("hid").alias("sid")), "src")
              .join(hid.select(F.col("host").alias("dst"),
                               F.col("hid").alias("did")), "dst")
              .select(F.col("sid").alias("src"),
                      F.col("did").alias("dst")))
    comps = scc(he_ids).localCheckpoint(eager=True)
    named = (comps.join(hid.select(F.col("hid").alias("id"), "host"),
                        "id")
             .join(hid.select(F.col("hid").alias("comp"),
                              F.col("host").alias("comp_host")),
                   "comp")
             .select(F.col("host").alias("id"),
                     F.col("comp_host").alias("comp")))
    named.write.mode("overwrite").parquet(args.out_dir + "/scc")
    sizes = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("n"))
    big = sizes.orderBy(F.desc("n"), F.asc("comp")).limit(1).collect()
    n_comps = sizes.count()
    big_n = big[0]["n"] if big else 0
    print(f"WEBGRAPH_STATS stage=scc components={n_comps} "
          f"largest={big_n}")

    dag = condensation(he_ids, comps)
    lv = topo_levels(dag.select(F.col("csrc").alias("src"),
                                F.col("cdst").alias("dst")))
    lv.write.mode("overwrite").parquet(args.out_dir + "/levels")
    mx = lv.agg(F.coalesce(F.max("level"), F.lit(0)).alias("m")) \
           .collect()[0]["m"]
    print(f"WEBGRAPH_STATS stage=condensation depth={mx}")

    r = degree_assortativity(he).collect()[0]
    print(f"WEBGRAPH_STATS stage=assortativity n_edges={r['n_edges']} "
          f"r={r['r']}")


if __name__ == "__main__":
    main(sys.argv[1:])

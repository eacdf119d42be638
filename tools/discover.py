"""spark-submit crawl discovery: sitemaps + feeds + robots.txt in,
an admitted politeness-scheduled frontier out.

    spark-submit --master local[N] --py-files ferenda_spark.zip \
        tools/discover.py <out_dir> \
        [--sitemaps SITEMAPS_PARQUET] [--feeds FEEDS_PARQUET] \
        [--robots ROBOTS_PARQUET] [--visited VISITED_PARQUET] \
        [--agent '*'] [--default-delay-ms 1000] [--max-per-host 100]

The one-command discovery surface composing the frontier trio the
way a crawler round actually runs, every stage an independently
oracle-gated operator:

  1. candidate urls    sitemaps (operators/sitemaps.parse_sitemaps,
                       urlset locs) ∪ feed entries
                       (sources/feeds.feed_entries links) — each a
                       (url, xml) parquet of fetched documents
  2. dedup + anti-join per-url provenance kept (min source), then
                       LEFT ANTI against --visited (url column)
  3. robots admission  operators/robots.parse_robots +
                       robots_filter over --robots
                       (domain, robots_txt) fetched bodies
  4. politeness        crawl.schedule_fetches with per-host
                       crawl-delay from the same robots parse

Outputs <out_dir>/frontier (url, source, host, fetch_seq,
not_before_millis) plus one DISCOVER_STATS line per stage; exits
nonzero when nothing survives (an empty frontier round is an
upstream bug, never a success).  Parse-error rows are counted and
printed per input, never dropped silently.
"""

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _parse_args(argv):
    p = argparse.ArgumentParser(prog="discover")
    p.add_argument("out_dir")
    p.add_argument("--sitemaps", default=None)
    p.add_argument("--feeds", default=None)
    p.add_argument("--robots", default=None)
    p.add_argument("--visited", default=None)
    p.add_argument("--agent", default="*")
    p.add_argument("--default-delay-ms", type=int, default=1000)
    p.add_argument("--max-per-host", type=int, default=100)
    return p.parse_args(argv)


def main(argv=None) -> int:
    from ferenda_spark.operators.crawl import schedule_fetches
    from ferenda_spark.operators.robots import (parse_robots,
                                                robots_filter)
    from ferenda_spark.operators.sitemaps import parse_sitemaps
    from ferenda_spark.sources.feeds import feed_entries

    args = _parse_args(sys.argv[1:] if argv is None else argv)
    if not args.sitemaps and not args.feeds:
        print("DISCOVER_STATS stage=input none "
              "(need --sitemaps and/or --feeds)")
        return 1
    spark = SparkSession.builder.appName("discover").getOrCreate()

    arms = []
    if args.sitemaps:
        sm = parse_sitemaps(spark.read.parquet(args.sitemaps))
        errs = sm.filter(F.col("error").isNotNull()).count()
        cand = (sm.filter(F.col("error").isNull()
                          & (F.col("kind") == "url"))
                .select(F.col("loc").alias("url"),
                        F.lit("sitemap").alias("source")))
        n = cand.count()
        print(f"DISCOVER_STATS stage=sitemaps urls={n} errors={errs}")
        arms.append(cand)
    if args.feeds:
        fe = feed_entries(spark.read.parquet(args.feeds))
        errs = fe.filter(F.col("error").isNotNull()).count()
        cand = (fe.filter(F.col("error").isNull()
                          & F.col("link").isNotNull())
                .select(F.col("link").alias("url"),
                        F.lit("feed").alias("source")))
        n = cand.count()
        print(f"DISCOVER_STATS stage=feeds urls={n} errors={errs}")
        arms.append(cand)

    cand = arms[0]
    for a in arms[1:]:
        cand = cand.unionByName(a)
    cand = (cand.groupBy("url")
            .agg(F.min("source").alias("source")))
    n_cand = cand.count()
    if args.visited:
        seen = spark.read.parquet(args.visited).select("url").distinct()
        cand = cand.join(seen, "url", "left_anti")
    n_new = cand.count()
    print(f"DISCOVER_STATS stage=dedup candidates={n_cand} "
          f"new={n_new}")

    delays = None
    if args.robots:
        rules = parse_robots(spark.read.parquet(args.robots),
                             agent=args.agent)
        cand = robots_filter(cand, rules)
        n_adm = cand.count()
        print(f"DISCOVER_STATS stage=robots admitted={n_adm} "
              f"blocked={n_new - n_adm}")
        delays = rules
    else:
        print("DISCOVER_STATS stage=robots skipped=True "
              "(no --robots)")

    sched = schedule_fetches(
        cand, delays=delays,
        default_delay_millis=args.default_delay_ms,
        max_per_host=args.max_per_host)
    sched.write.mode("overwrite").parquet(f"{args.out_dir}/frontier")
    out = spark.read.parquet(f"{args.out_dir}/frontier")
    n_f = out.count()
    n_h = out.select("host").distinct().count()
    print(f"DISCOVER_STATS stage=frontier urls={n_f} hosts={n_h} "
          f"out={args.out_dir}")
    return 0 if n_f > 0 else 1


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entry point for the crawl engine (north rule: runs via
``spark-submit --py-files`` on a multi-executor cluster).

Usage (local sandbox):

    cd /root/repo && zip -qr /tmp/odss.zip outage_data_scraper_spark
    spark-submit --master 'local[8]' --py-files /tmp/odss.zip \
        scripts/run_crawl.py --synthetic-urls 20000 --catalog /tmp/crawl_out \
        --waves 4 --seen-mode bloom

On a cluster, swap --master for the cluster manager and point --seeds at
the events directory (or --synthetic-urls for the generated frontier).
The job is resumable: re-running with the same --catalog continues from
the last committed wave.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description="Distributed URL-frontier crawl")
    p.add_argument("--catalog", required=True, help="snapshot catalog directory")
    p.add_argument("--seeds", help="events/ directory of seed JSONs (reference format)")
    p.add_argument("--synthetic-urls", type=int, help="generate a synthetic frontier of N URLs")
    p.add_argument("--synthetic-hosts", type=int, default=0)
    p.add_argument("--waves", type=int, default=10)
    p.add_argument("--per-host-k", type=int, default=8)
    p.add_argument("--num-parts", type=int, default=64)
    p.add_argument("--salt", type=int, default=16)
    p.add_argument("--rate-per-host", type=float, default=1.0)
    p.add_argument("--seen-mode", choices=["exact", "bloom"], default="exact")
    p.add_argument("--simulated-clock", action="store_true",
                   help="virtual politeness clock (fixture/bench mode)")
    p.add_argument("--fetcher", choices=["fixture", "http"], default="fixture",
                   help="fixture renderer (offline, default) or real HTTP "
                        "(UA + 10 s timeout, util.py:63–89 semantics)")
    p.add_argument("--http-timeout", type=float, default=10.0)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("odss-crawl").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from outage_data_scraper_spark.catalog import SnapshotCatalog
    from outage_data_scraper_spark.frontier.crawler import Crawler
    from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
    from outage_data_scraper_spark.sources.seeds import (
        load_seed_events,
        seeds_df,
        synthetic_seeds,
    )

    if args.fetcher == "http":
        from outage_data_scraper_spark.sources.http import make_http_fetcher

        fetcher_factory = make_http_fetcher(timeout_s=args.http_timeout)
    else:
        fetcher_factory = make_fixture_fetcher

    cat = SnapshotCatalog(args.catalog)
    crawler = Crawler(
        spark, cat, fetcher_factory,
        per_host_k=args.per_host_k, num_parts=args.num_parts, salt=args.salt,
        rate_per_host=args.rate_per_host, seen_mode=args.seen_mode,
        simulated_clock=args.simulated_clock,
    )

    if cat.exists("waves"):
        nxt = crawler.resume()
        print(f"resuming from wave {nxt}", file=sys.stderr)
    elif args.seeds:
        crawler.bootstrap(seeds_df(spark, load_seed_events(args.seeds)))
    elif args.synthetic_urls:
        n_hosts = args.synthetic_hosts or max(args.synthetic_urls // 50, 8)
        crawler.bootstrap(synthetic_seeds(spark, args.synthetic_urls, n_hosts))
    else:
        p.error("need --seeds or --synthetic-urls for a fresh catalog")

    stats = crawler.run(max_waves=args.waves)
    out = {
        "waves": [s.__dict__ for s in stats],
        "total_urls": sum(s.popped for s in stats),
        "total_records": sum(s.records for s in stats),
        "failed": sum(s.failed for s in stats),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

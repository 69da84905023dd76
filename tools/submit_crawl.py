"""spark-submit entrypoint for the crawl engine (north_rule: `spark-submit
--py-files`).

Package and run:

    cd /root/repo && zip -qr /tmp/wcs.zip web_crawler_spark
    /opt/spark/bin/spark-submit --master 'local[8]' \
        --py-files /tmp/wcs.zip tools/submit_crawl.py \
        --n-docs 20000 --epochs 1 --workdir /tmp/wcs-submit

For large synthesized webs pass --driver-memory (the DEMO materializes the
fixture web driver-side before createDataFrame; a real deployment reads
pages from an Iceberg/parquet table and needs no driver headroom —
measured: 1M docs / 100k articles wants ~24g only for the fixture build).

On a real cluster, swap --master for the cluster manager and point
--pages/--workdir at Iceberg/DFS paths; everything else is identical.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--n-hosts", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages", default=None,
                    help="existing pages parquet; default: synthesize")
    args = ap.parse_args()
    if args.pages:
        ap.error("--pages (external corpus mode) is not wired yet: "
                 "provide a seeds source for your corpus and remove this guard")

    # spark-submit provides the session config (master, memory, py-files)
    spark = SparkSession.builder.appName("wcs-crawl").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from web_crawler_spark import html_synth
    from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine

    web = html_synth.synth_web(n_articles=args.n_docs // 10 or 10,
                               n_hosts=args.n_hosts, seed=42)
    pages = html_synth.pages_df(spark, web, n_partitions=16)
    seeds = html_synth.seeds_df(spark, web)

    eng = CrawlEngine(spark, args.workdir, pages, CrawlConfig())
    t0 = time.time()
    totals = eng.run(seeds, max_epochs=args.epochs)
    dt = time.time() - t0
    arts = eng.articles.read(spark).count()
    print(json.dumps({"epochs": totals["epochs"], "articles": arts,
                      "seconds": round(dt, 2),
                      "articles_per_sec": round(arts / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()

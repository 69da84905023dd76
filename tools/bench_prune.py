"""Frontier scan-pruning microbench (round-5: manifest min/max stats).

Builds a retry-heavy DeltaFrontier — a due base snapshot plus N delta
commits of far-future backoff requeues (the shape a long politeness-bound
crawl accumulates) — and times the epoch-shaped read both ways:

  * full read + residual filter (what every epoch paid before round 5)
  * read(due_before=...) — manifest-stats file pruning + residual filter

Emits ONE JSON line with wall times, files planned, and bytes on disk.
Run: python tools/bench_prune.py  [DUE_ROWS=...] [DEFER_ROWS=...] [DELTAS=...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark.session import get_spark  # noqa: E402
from web_crawler_spark.sources.tables import DeltaFrontier  # noqa: E402
from web_crawler_spark.plans.epoch import FRONTIER_DDL  # noqa: E402


def _rows(spark, n, start, next_fetch_ts, epoch_added):
    return spark.range(start, start + n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 256).cast("string"),
                 F.lit(".com/a/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 256).cast("string"),
                 F.lit(".com")).alias("host"),
        F.lit("article").alias("kind"), F.lit("rbc").alias("parser_class"),
        F.lit(1).cast("bigint").alias("source_id"),
        F.lit(1).alias("priority"), F.col("id").alias("discovered_seq"),
        F.lit(float(next_fetch_ts)).alias("next_fetch_ts"),
        F.lit(1).alias("retries"),
        F.lit(None).cast("string").alias("date_str"),
        F.lit(None).cast("string").alias("list_title"),
        F.lit(None).cast("string").alias("list_summary"),
        F.lit(int(epoch_added)).alias("epoch_added"))


def main() -> None:
    due_rows = int(os.environ.get("DUE_ROWS", "200000"))
    defer_rows = int(os.environ.get("DEFER_ROWS", "1000000"))
    deltas = int(os.environ.get("DELTAS", "8"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-prune", cores=cores)

    wd = tempfile.mkdtemp(prefix="wcs-prune-")
    try:
        t = DeltaFrontier(os.path.join(wd, "frontier"), FRONTIER_DDL)
        t.overwrite(_rows(spark, due_rows, 0, 0.0, 0).repartition(8), 0)
        for e in range(1, deltas + 1):
            adds = _rows(spark, defer_rows, 10_000_000 * e, 1e9, e) \
                .repartition(8)
            empty_dels = _rows(spark, 0, 0, 0.0, 0) \
                .select(*DeltaFrontier.KEY)
            t.commit_delta(e, t.stage_delta(adds, empty_dels, e))

        total = due_rows + deltas * defer_rows

        def timed(df):
            t0 = time.time()
            n = df.count()
            return n, round(time.time() - t0, 3), len(df.inputFiles())

        # epoch-shaped consumer: rows due before ts=100
        full = t.read(spark).filter(F.col("next_fetch_ts") <= 100.0)
        n_full, s_full, files_full = timed(full)
        pruned = t.read(spark, due_before=100.0)
        n_pruned, s_pruned, files_pruned = timed(pruned)
        assert n_full == n_pruned == due_rows, (n_full, n_pruned)

        print(json.dumps({
            "metric": "frontier_prune_read_seconds",
            "frontier_rows": total, "due_rows": due_rows,
            "defer_deltas": deltas,
            "full_read": {"seconds": s_full, "files_planned": files_full},
            "pruned_read": {"seconds": s_pruned,
                            "files_planned": files_pruned},
            "speedup": round(s_full / s_pruned, 2) if s_pruned else None,
            "table_bytes": t.stats()["add_bytes"],
        }))
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Custom stateful streaming operator: per-host politeness scheduling with
applyInPandasWithState (SURVEY.md §2.9 T2 on the streaming runtime).

The batch engine realizes the per-host token bucket as window expressions
(operators/politeness.schedule_epoch). On a live fetch-request stream the
same budget needs state that SURVIVES micro-batch boundaries — the last
scheduled fetch per host — which no built-in streaming aggregation
expresses: this is exactly the applyInPandasWithState use case.

Reference analog: the per-crawler `time.sleep(REQUEST_DELAY)` between
requests (/root/reference/app/scrapers/base_crawler.py:65-70), lifted to a
keyed stream where each host's clock is a GroupState value.

Determinism contract: with a constant delay the bucket has the closed form

    sched_i = max_{j<=i}(req_ts_j - delay*j) + delay*i     (per host,
              rows ordered by (req_ts, url))

so the operator — though stateful and streaming — is value-checkable by a
plain SQL window oracle (the driver's langid/BPE lookup-join discipline,
applied to streaming state). Inputs use integer-second timestamps so the
arithmetic is exact in doubles on both sides.
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "host string, url string, sched_ts double"
STATE_SCHEMA = "last_sched double"


def _scheduler_fn(delay: float):
    """Factory for the keyed stateful function. Rows within a batch are
    normalized to (req_ts, url) order; the carried state is the host's last
    scheduled timestamp, so spacing holds ACROSS micro-batches."""

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["req_ts", "url"], kind="mergesort")
        last = state.get[0] if state.exists else None
        scheds = []
        for t in batch["req_ts"]:
            t = float(t)
            s = t if last is None else max(t, last + delay)
            scheds.append(s)
            last = s
        state.update((float(last),))
        yield pd.DataFrame({"host": host, "url": batch["url"],
                            "sched_ts": scheds})

    return fn


def stream_politeness_schedule(spark: SparkSession, requests: DataFrame,
                               delay: float = 1.0, n_files: int = 3
                               ) -> DataFrame:
    """Schedule a stream of fetch requests (host, url, req_ts double —
    integer seconds) under a per-host inter-request delay; returns
    (host, url, sched_ts) for every request.

    Mechanics mirror stream_sessionize: the input is staged as a multi-file
    parquet source consumed one file per trigger, so several micro-batches
    run and the per-host state demonstrably carries across them. Files are
    sliced BY EVENT TIME (range-sliced on req_ts) with strictly increasing
    mtimes, because the file source orders batches by modification time and
    a token bucket is order-sensitive — on a real deployment the same
    contract comes from the log/queue's per-key time order.

    The file staging is HARNESS-ONLY machinery (it exists so the oracle can
    drive a deterministic multi-batch stream); a production deployment
    reads a queue/log directly. Even so, slices are written BY SPARK
    (coalesce(1).write.parquet, executor-side) — the input rows never
    funnel through the driver (round-4 ADVICE); only scalar bounds do.
    """
    from ..util import scratch_dir
    workdir = scratch_dir("wcs-polstream-")
    src = os.path.join(workdir, "src")
    ck = os.path.join(workdir, "ck")
    os.makedirs(src, exist_ok=True)
    req = requests.select("host", "url", F.col("req_ts").cast("double")
                          .alias("req_ts"))
    if req.isEmpty():
        return spark.createDataFrame([], schema=OUT_SCHEMA)

    # event-time range slicing into n_files micro-batch files
    bounds = list(req.selectExpr(
        *[f"percentile_approx(req_ts, {i / n_files}, 10000)"
          for i in range(1, n_files)]).first()) + [float("inf")]
    lo = float("-inf")
    for i, hi in enumerate(bounds):
        part = req.filter((F.col("req_ts") > F.lit(lo)) &
                          (F.col("req_ts") <= F.lit(hi))
                          if lo != float("-inf")
                          else F.col("req_ts") <= F.lit(hi))
        # one FILE per slice (the stream consumes one file per trigger):
        # coalesce(1) is bounded by the slice size — harness-scale by
        # construction — and keeps the write on the executors
        stage = os.path.join(workdir, f"stage-{i:03d}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        parts = [p for p in os.listdir(stage)
                 if p.startswith("part-") and p.endswith(".parquet")]
        # skip EMPTY slices (clustered timestamps can leave a percentile
        # range with no rows): Spark emits a part file even for a 0-row
        # write, so the existence check alone is not enough — read the
        # footer row count (local metadata, no job). An extra empty
        # micro-batch is benign under NoTimeout but would fire state
        # expiry if a processing-time timeout were ever configured.
        if parts:
            import pyarrow.parquet as pq
            staged = os.path.join(stage, parts[0])
            if pq.ParquetFile(staged).metadata.num_rows > 0:
                f = os.path.join(src, f"slice-{i:03d}.parquet")
                os.replace(staged, f)
                os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
        lo = hi

    stream = (spark.readStream.schema(req.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src)
              .groupBy("host")
              .applyInPandasWithState(
                  _scheduler_fn(delay), outputStructType=OUT_SCHEMA,
                  stateStructType=STATE_SCHEMA, outputMode="append",
                  timeoutConf=GroupStateTimeout.NoTimeout))
    qname = "polsched_" + uuid.uuid4().hex[:8]
    q = (stream.writeStream.format("memory").queryName(qname)
         .outputMode("append").option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname).select("host", "url", "sched_ts")

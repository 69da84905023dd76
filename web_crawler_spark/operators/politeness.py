"""Per-host politeness scheduling (T2/T3) + hot-host skew handling.

Reference semantics: one crawler instance per source enforces
``request_delay`` seconds between consecutive fetches
(/root/reference/app/scrapers/base_crawler.py:65-70); 429/5xx retried with
backoff_factor=1 (base_crawler.py:43-48) and the API path sleeps 60 s on 429
(api/base_fetcher.py:123-126).

Spark realization: a two-phase per-host budget truncation (no single task
ever sorts a hot host's whole backlog) followed by a pure window-function
token bucket — sched_ts = runningmax(greatest(epoch_start + delay·rank,
next_fetch_ts)) over the per-host (priority, next_fetch_ts, discovered_seq)
order, the total order the reference's sequential loop induces. No Python
anywhere in the schedule; per-host group size is bounded by
``per_host_budget`` (a host can only absorb epoch_seconds/delay URLs per
epoch anyway).

Skew: the *schedule* must be per-host-sequential, but the downstream
fetch-join + parse need not be. After scheduling we repartition by
(host, salt) where hot hosts (row_count > hot_threshold) fan out over
``n_salt`` deterministic sub-keys — this breaks hot-domain skew in the
shuffle that feeds the fetch join (north_rule) while politeness ordering
stays encoded in sched_ts.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: fan-in for the two-phase per-host truncation: a hot host's backlog is
#: first cut to `budget` rows inside each of N_PREBUCKETS hash buckets
#: (parallel sorts over backlog/N rows each), then the survivors (≤ N·budget
#: rows) take the final per-host top-budget. Exact distributed top-k: every
#: global-top-budget row is within the top budget of its own bucket.
N_PREBUCKETS = 32


def truncate_per_host(frontier: DataFrame, per_host_budget: int,
                      prebucket: bool = True,
                      budget_col: Optional[str] = None) -> DataFrame:
    """Keep the first ``per_host_budget`` rows per host in
    (priority, next_fetch_ts, discovered_seq) order.

    With ``budget_col`` set, that column gives each ROW its host's budget
    (authority-weighted budgets: the engine joins a per-host budget dim
    before truncation; every row of a host carries the same value, and
    ``per_host_budget`` stays the upper bound the prebucket phase cuts to —
    a per-host budget can only be <= it by construction).

    With ``prebucket`` the hot host never sorts its full backlog in one
    task: phase 1 windows over (host, xxhash64(url)%N) partitions — the
    skew-killer the single-window plan lacked (a 30%%-hot host at 10^8
    frontier rows put ~3·10^7 rows into ONE sort task). Phase 2's window
    input is bounded by N_PREBUCKETS·budget regardless of backlog."""
    from pyspark.sql import Window
    order = [F.col("priority").asc(), F.col("next_fetch_ts").asc(),
             F.col("discovered_seq").asc()]
    cap = F.col(budget_col) if budget_col else F.lit(per_host_budget)
    if prebucket:
        w1 = Window.partitionBy("host", "__bkt").orderBy(*order)
        frontier = (frontier
                    .withColumn("__bkt",
                                F.pmod(F.xxhash64(F.col("url")),
                                       F.lit(N_PREBUCKETS)))
                    .withColumn("__rk", F.row_number().over(w1))
                    .filter(F.col("__rk") <= cap)
                    .drop("__rk", "__bkt"))
    w2 = Window.partitionBy("host").orderBy(*order)
    return (frontier.withColumn("__rk", F.row_number().over(w2))
            .filter(F.col("__rk") <= cap).drop("__rk"))


#: above this many distinct per-host crawl delays the inlined CASE chain
#: would blow up the expression tree — switch to a broadcast-joined delay
#: dimension (the web-scale shape: millions of robots Crawl-delays)
MAX_INLINE_DELAYS = 64


def schedule_epoch(frontier: DataFrame,
                   default_delay: float = 1.0,
                   per_host_budget: int = 10_000,
                   epoch_start_ts: float = 0.0,
                   host_delays: Optional[Dict[str, float]] = None,
                   prebucket: bool = True,
                   approx_rows: Optional[int] = None,
                   host_budgets: Optional[DataFrame] = None,
                   ) -> DataFrame:
    """Assign sched_ts per row, per-host token bucket.

    Input frontier columns: host, priority, next_fetch_ts, discovered_seq
    (+payload). Output adds sched_ts double and keeps only the first
    ``per_host_budget`` rows per host for this epoch (the rest stay enqueued
    for the next epoch).

    Entirely JVM-side: two-phase budget truncation, then the token bucket as
    window expressions — sched_ts = runningmax(greatest(epoch_start +
    delay·row_number, next_fetch_ts)) over the per-host crawl order. The
    running max keeps the bucket monotone when a retry's next_fetch_ts
    (backoff penalty) pushes a row later. Round 1 ran this as an
    applyInPandas token bucket; the window form is value-identical and takes
    Python (and the hot host's serial pandas group) out of the schedule.

    ``host_budgets`` (optional, columns host + __budget int) scales the
    budget PER HOST — the engine's authority-weighted allocation (PageRank
    over the discovered host link graph; plans/epoch.py). It is a tiny dim
    (one row per RANKED host) and is broadcast; hosts not in it fall back
    to ``per_host_budget``. With budgets present the truncation can never
    be skipped (a budget below the frontier size must bind even when the
    whole frontier fits the default budget).
    """
    host_delays = host_delays or {}
    # ``approx_rows`` (the caller's known frontier count) prunes no-op work:
    # a frontier that fits the budget outright needs no truncation at all,
    # and the prebucket phase only pays off when a single host could exceed
    # the budget — both windows are exact either way, this is plan pruning.
    if host_budgets is not None:
        frontier = (frontier
                    .join(F.broadcast(host_budgets.select("host", "__budget")),
                          "host", "left")
                    .withColumn("__budget",
                                F.coalesce("__budget",
                                           F.lit(int(per_host_budget)))))
        if approx_rows is not None:
            prebucket = prebucket and approx_rows > 4 * per_host_budget
        frontier = truncate_per_host(frontier, per_host_budget, prebucket,
                                     budget_col="__budget").drop("__budget")
    elif approx_rows is not None and approx_rows <= per_host_budget:
        pass                                    # truncation is a no-op
    else:
        if approx_rows is not None:
            prebucket = prebucket and approx_rows > 4 * per_host_budget
        frontier = truncate_per_host(frontier, per_host_budget, prebucket)

    if len(host_delays) <= MAX_INLINE_DELAYS:
        delay = F.lit(float(default_delay))
        for h, d in host_delays.items():
            delay = F.when(F.col("host") == h, F.lit(float(d))).otherwise(delay)
        frontier = frontier.withColumn("__delay", delay)
    else:
        ddf = frontier.sparkSession.createDataFrame(
            [(h, float(d)) for h, d in host_delays.items()],
            schema="host string, __hd double")
        frontier = (frontier.join(F.broadcast(ddf), "host", "left")
                    .withColumn("__delay",
                                F.coalesce("__hd",
                                           F.lit(float(default_delay))))
                    .drop("__hd"))

    from pyspark.sql import Window
    order = [F.col("priority").asc(), F.col("next_fetch_ts").asc(),
             F.col("discovered_seq").asc()]
    w = Window.partitionBy("host").orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = (F.lit(float(epoch_start_ts)) +
            F.col("__delay") * F.row_number().over(w))
    sched = F.max(F.greatest(base, F.col("next_fetch_ts"))).over(run)
    return (frontier.withColumn("sched_ts", sched.cast("double"))
            .drop("__delay"))


def hot_host_salts(frontier: DataFrame, hot_threshold: int = 50_000,
                   n_salt: int = 8) -> Dict[str, int]:
    """Compute {host: n_sub} for hosts whose epoch row-count exceeds the
    threshold. One tiny aggregation; result is driver-side (broadcast-size:
    #hot hosts is small by definition)."""
    rows = (frontier.groupBy("host").count()
            .filter(F.col("count") > hot_threshold).collect())
    return {r["host"]: n_salt for r in rows}


def salted_repartition(df: DataFrame, salts: Dict[str, int],
                       n_partitions: Optional[int] = None) -> DataFrame:
    """Repartition by (host, salt): cold hosts keep salt 0 (one partition →
    politeness order trivially preserved); hot hosts spread across n_sub
    deterministic sub-keys keyed by xxhash64(url)."""
    salt = F.lit(0)
    for h, n in salts.items():
        salt = F.when(F.col("host") == h,
                      F.pmod(F.xxhash64(F.col("url")), F.lit(int(n)))
                      ).otherwise(salt)
    out = df.withColumn("host_salt", salt.cast("int"))
    if n_partitions:
        return out.repartition(n_partitions, "host", "host_salt")
    return out.repartition("host", "host_salt")


def backoff_requeue(failed: DataFrame, base_penalty: float = 1.0,
                    rate_limit_penalty: float = 60.0, max_retries: int = 3
                    ) -> DataFrame:
    """Failed fetches → frontier re-entries with exponential-ish backoff:
    next_fetch_ts += penalty * retries (backoff_factor=1 semantics,
    base_crawler.py:43-48); 429 rows get the 60 s penalty
    (base_fetcher.py:123-126). Rows exceeding max_retries are dropped (the
    reference's Retry(total=3) gives up the same way)."""
    penalty = F.when(F.col("fetch_status") == "429",
                     F.lit(rate_limit_penalty)) \
               .otherwise(F.lit(base_penalty) * (F.col("retries") + 1))
    return (failed.filter(F.col("retries") < max_retries)
            .withColumn("retries", F.col("retries") + 1)
            .withColumn("next_fetch_ts", F.col("sched_ts") + penalty)
            .drop("fetch_status", "sched_ts"))

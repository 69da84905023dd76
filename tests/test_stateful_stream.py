"""stream_politeness_schedule — applyInPandasWithState politeness scheduler.

Pins (a) value equality with a plain-Python token-bucket simulation, (b)
that per-host state genuinely carries ACROSS micro-batches (the property no
stateless streaming aggregation gives), (c) the per-host spacing invariant,
and (d) degenerate input.
"""

from pyspark.sql import functions as F

from web_crawler_spark.streaming import stateful

DELAY = 2.0


def _requests(spark):
    # 3 hosts x 12 requests interleaved over 60 integer seconds; bursts
    # (same-second requests per host) force the bucket to space them out
    rows = []
    for i in range(36):
        host = f"h{i % 3}.com"
        burst = (i // 3) % 2            # every other slot is a burst pair
        ts = float(10 * (i // 6) + (0 if burst else i % 3))
        rows.append((host, f"https://{host}/p{i}", ts))
    return spark.createDataFrame(
        rows, schema="host string, url string, req_ts double")


def _simulate(rows, delay):
    """Reference: per host, in (req_ts, url) order, s = max(t, last+delay)."""
    out = {}
    last = {}
    for host, url, t in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        s = t if host not in last else max(t, last[host] + delay)
        last[host] = s
        out[(host, url)] = s
    return out


def test_stateful_schedule_matches_simulation(spark):
    req = _requests(spark)
    got = {(r.host, r.url): r.sched_ts for r in
           stateful.stream_politeness_schedule(spark, req, delay=DELAY,
                                               n_files=4).collect()}
    want = _simulate([(r.host, r.url, r.req_ts) for r in req.collect()],
                     DELAY)
    assert got == want


def test_state_carries_across_micro_batches(spark):
    """One host, requests at 1-second intervals under a 2-second delay,
    split across 4 single-file triggers: if state reset per batch, each
    batch's FIRST row would be scheduled at its own req_ts (the bucket
    falls behind and req_ts=i < i*DELAY from row 2 on) — instead the
    carried GroupState must keep the global spacing s_i = i*DELAY."""
    req = spark.createDataFrame(
        [("h.com", f"https://h.com/p{i:02d}", float(i)) for i in range(12)],
        schema="host string, url string, req_ts double")
    out = sorted(stateful.stream_politeness_schedule(
        spark, req, delay=DELAY, n_files=4).collect(),
        key=lambda r: r.sched_ts)
    assert len(out) == 12
    scheds = [r.sched_ts for r in out]
    assert scheds == [i * DELAY for i in range(12)]
    # per-host spacing invariant, stated explicitly
    assert all(b - a >= DELAY - 1e-9 for a, b in zip(scheds, scheds[1:]))


def test_stateful_schedule_empty_input(spark):
    empty = spark.createDataFrame(
        [], schema="host string, url string, req_ts double")
    out = stateful.stream_politeness_schedule(spark, empty)
    assert out.count() == 0
    assert out.columns == ["host", "url", "sched_ts"]


def test_stateful_schedule_never_schedules_before_request(spark):
    req = _requests(spark)
    out = stateful.stream_politeness_schedule(spark, req, delay=DELAY)
    j = out.join(req, ["host", "url"])
    assert j.filter(F.col("sched_ts") < F.col("req_ts")).count() == 0

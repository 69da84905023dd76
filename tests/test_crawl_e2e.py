"""End-to-end: Spark crawl engine vs the reference-semantics simulator.

North-rule gates (BASELINE.json):
  * byte-identical extracted text per url
  * URL-seen set equality under same seeds + politeness budget
  * crawl ordering equality (total order = (priority, discovered_seq),
    the distributed encoding of the reference's sequential loop)
  * resumable from checkpoint
"""

import pytest

from web_crawler_spark import html_synth, refspec
from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def web():
    return html_synth.synth_web(n_articles=120, n_hosts=6, seed=42)


@pytest.fixture(scope="module")
def golden(web):
    return refspec.simulate_crawl(web["pages"], web["seeds"])


def run_engine(spark, workdir, web, max_epochs=5, **cfg_kw):
    pages = html_synth.pages_df(spark, web)
    seeds = html_synth.seeds_df(spark, web)
    eng = CrawlEngine(spark, workdir, pages, CrawlConfig(**cfg_kw))
    eng.run(seeds, max_epochs=max_epochs)
    return eng


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory, web):
    wd = str(tmp_path_factory.mktemp("lake-e2e"))
    # bloom_min_articles=0 forces the bloom seen-filter path so the e2e
    # byte-identity/seen-set gates exercise it even at fixture scale
    return run_engine(spark, wd, web, bloom_min_articles=0)


def test_byte_identity_and_seen_set(spark, engine, golden):
    got = {r["url"]: r for r in engine.articles.read(spark).collect()}
    exp = {a["url"]: a for a in golden["articles"]}
    assert set(got) == set(exp), (
        f"seen-set: extra={set(got)-set(exp)} missing={set(exp)-set(got)}")
    for url, e in exp.items():
        g = got[url]
        assert g["title"] == e["title"], url
        assert g["content"] == e["content"], url          # byte-identical
        assert g["published_date"] == e["published_date"], url
        assert g["source_id"] == e["source_id"], url


def test_all_four_parser_classes_produce_articles(spark, engine, golden):
    """The fixture web carries rbc + bbc + guardian + investing sites; the
    engine must store articles from every parser class (guards against a
    predicate regression silently dropping one site)."""
    urls = [r["url"] for r in
            engine.articles.read(spark).select("url").collect()]
    for marker in ("rbc.ua", "www.bbc.com", "www.theguardian.com",
                   "www.investing.com"):
        assert any(marker in u for u in urls), f"no articles from {marker}"
    # and the golden simulator agrees it is non-degenerate
    gurls = [a["url"] for a in golden["articles"]]
    assert any("www.investing.com" in u for u in gurls)


def test_crawl_order_matches_reference(spark, engine, golden):
    ref_order = [u for (_, u, _, action, _) in golden["trace"]
                 if action == "fetched"]
    got_order = [r["url"] for r in engine.articles.read(spark)
                 .orderBy("priority", "discovered_seq").collect()]
    assert got_order == ref_order


def test_politeness_schedule_respects_delay(spark, workdir, web):
    """Within every host the scheduler's assigned fetch times must be at
    least request_delay apart (token bucket, base_crawler.py:65-70)."""
    from web_crawler_spark.operators.politeness import schedule_epoch
    pages = html_synth.pages_df(spark, web)
    seeds = html_synth.seeds_df(spark, web)
    eng = CrawlEngine(spark, workdir, pages, CrawlConfig(request_delay=2.0))
    eng.bootstrap(seeds)
    sched = schedule_epoch(eng.frontier.read(spark), default_delay=2.0)
    rows = sched.select("host", "sched_ts").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["sched_ts"])
    assert by_host
    for host, ts in by_host.items():
        ts = sorted(ts)
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert all(g >= 2.0 - 1e-9 for g in gaps), (host, gaps[:5])


def test_resume_from_checkpoint(spark, tmp_path, web, golden):
    """Run 1 epoch, 'crash', construct a fresh engine over the same workdir,
    finish — final state identical to an uninterrupted run."""
    wd = str(tmp_path / "lake-resume")
    pages = html_synth.pages_df(spark, web)
    seeds = html_synth.seeds_df(spark, web)
    eng1 = CrawlEngine(spark, wd, pages, CrawlConfig())
    eng1.bootstrap(seeds)
    eng1.run_epoch(0)                      # lists fetched, articles discovered
    # simulate crash + resume with a brand-new engine object
    eng2 = CrawlEngine(spark, wd, pages, CrawlConfig())
    eng2.run(seeds=None, max_epochs=5)
    got = {r["url"] for r in eng2.articles.read(spark).collect()}
    exp = {a["url"] for a in golden["articles"]}
    assert got == exp
    # idempotency: a third run does nothing
    n_before = eng2.articles.read(spark).count()
    eng3 = CrawlEngine(spark, wd, pages, CrawlConfig())
    eng3.run(seeds=None, max_epochs=2)
    assert eng3.articles.read(spark).count() == n_before


def test_date_filter_and_cross_run_dedup(spark, tmp_path, web):
    """Date-windowed crawl keeps only in-range articles; re-crawling the same
    web with a wider window skips already-seen urls (UNIQUE(url) semantics,
    database.py:57)."""
    wd = str(tmp_path / "lake-dates")
    pages = html_synth.pages_df(spark, web)
    seeds = html_synth.seeds_df(spark, web)
    cfg = CrawlConfig(start_date="2024-01-01", end_date="2024-01-02",
                      bloom_min_articles=0)
    eng = CrawlEngine(spark, wd, pages, cfg)
    eng.run(seeds, max_epochs=5)
    golden_windowed = refspec.simulate_crawl(
        web["pages"], web["seeds"], "2024-01-01", "2024-01-02")
    got = {r["url"] for r in eng.articles.read(spark).collect()}
    assert got == {a["url"] for a in golden_windowed["articles"]}
    dates = [r["published_date"] for r in eng.articles.read(spark).collect()]
    assert all(d is None or "2024-01-01" <= d <= "2024-01-02" for d in dates)


def test_metrics_and_checkpoints_written(spark, engine):
    m = engine.metrics.read(spark)
    assert m.count() > 0
    assert set(m.columns) == {"epoch", "host", "fetched", "parsed",
                              "discovered", "skipped_dup", "skipped_date",
                              "skipped_robots", "errors"}
    cp = engine.checkpoints.read(spark).orderBy("epoch").collect()
    assert [r["epoch"] for r in cp] == list(range(len(cp)))
    assert cp[-1]["frontier_out"] == 0     # drained
    # per-partition watermarked lineage (north_rule): every epoch has >=1
    # partition row; watermarks carry the politeness clock (monotone >= 0)
    pck = engine.partition_checkpoints.read(spark).collect()
    by_epoch = {}
    for r in pck:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == set(range(len(cp)))
    assert all(r["watermark_ts"] >= 0 and r["rows_in"] >= r["rows_out"] >= 0
               for r in pck)


def test_hot_host_salting_preserves_results(spark, tmp_path, web, golden):
    """With an aggressive hot threshold every host salts across sub-keys;
    the article set must be identical to the unsalted run (salting changes
    partitioning, never results)."""
    from web_crawler_spark import html_synth
    from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine
    pages = html_synth.pages_df(spark, web, n_partitions=4)
    seeds = html_synth.seeds_df(spark, web)
    eng = CrawlEngine(spark, str(tmp_path / "salted"), pages,
                      CrawlConfig(hot_threshold=1, n_salt=4))
    eng.run(seeds, max_epochs=4)
    got = {(r.url, r.content) for r in
           eng.articles.read(spark).select("url", "content").collect()}
    want = {(a["url"], a["content"]) for a in golden["articles"]}
    assert got == want


def test_bloom_rebuilds_when_seen_set_outgrows_capacity(spark, tmp_path, web):
    """Round-2 advice: a long crawl can outgrow the 10x headroom the bloom
    was sized for, silently degrading FPP. The engine must re-size: after
    the seen set exceeds the sized capacity, the next _seen_probe() call
    rebuilds a larger filter (persisted seen_shards table + manifest meta;
    crawl results stay correct — the exact anti-join backstop is separately
    e2e-gated)."""
    wd = str(tmp_path / "lake-bloomgrow")
    eng = run_engine(spark, wd, web, max_epochs=2, bloom_min_articles=0)
    meta0 = eng.seen_shards.meta()
    assert meta0 and meta0["capacity"] >= 100_000
    snaps0 = eng.seen_shards.committed_epochs()
    # simulate the seen set outgrowing the filter (long-crawl state)
    eng._articles_rows = meta0["capacity"] + 1
    probe = eng._seen_probe(99)
    assert probe is not None
    meta1 = eng.seen_shards.meta()
    assert meta1["capacity"] >= (meta0["capacity"] + 1) * 10
    assert eng.seen_shards.committed_epochs() != snaps0   # rebuilt snapshot
    # and a steady-state call does NOT rebuild again
    snaps1 = eng.seen_shards.committed_epochs()
    eng._seen_probe(99)
    assert eng.seen_shards.committed_epochs() == snaps1


def test_replay_after_articles_commit_crash(spark, tmp_path, web):
    """THE OTHER crash window (found round 5): articles.append(N) committed,
    pipeline checkpoint for N not yet. The replay of N must re-produce
    epoch N's output — before the as-of (before_epoch) seen reads, the
    replay saw its own orphan articles as already-seen, filtered them all
    out, and replace-appended epoch N EMPTY: measured loss of every
    article the epoch had stored."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F
    wd = str(tmp_path / "lake-replay")
    pages = html_synth.pages_df(spark, web)
    seeds = html_synth.seeds_df(spark, web)
    eng = CrawlEngine(spark, wd, pages, CrawlConfig(bloom_min_articles=0))
    eng.bootstrap(seeds)
    eng.run_epoch(0)
    stale = [r.asDict() for r in eng.frontier.read(spark).collect()]
    stale_df = spark.createDataFrame(
        stale, schema=eng.frontier.read(spark).schema)
    eng.run_epoch(1)
    n_after_1 = eng.articles.read(spark).count()
    assert n_after_1 > 0
    # craft the crash state: frontier stale at epoch-1 input, epoch-1
    # checkpoint missing, epoch-1 articles/metrics/seen_shards committed
    eng.frontier.overwrite(stale_df, 1)
    ck = os.path.join(wd, "checkpoints", "_manifest.json")
    man = json.load(open(ck))
    man["epochs"] = [e for e in man["epochs"] if e != 1]
    json.dump(man, open(ck, "w"))
    shutil.rmtree(os.path.join(wd, "checkpoints", "epoch=1"),
                  ignore_errors=True)
    eng2 = CrawlEngine(spark, wd, pages, CrawlConfig(bloom_min_articles=0))
    eng2.run(max_epochs=3)                     # resumes AT epoch 1 (replay)
    arts = eng2.articles.read(spark)
    assert arts.count() == n_after_1           # nothing lost
    assert arts.groupBy("url").count().filter(
        F.col("count") > 1).count() == 0       # nothing duplicated


def test_engine_bloom_never_collects_bits_to_driver(spark, tmp_path, web,
                                                    golden, monkeypatch):
    """Round-4 verdict Next #1 done-criterion: no bloom bytes ever visit
    the driver in the engine path — the filter is built, merged, and probed
    as (shard, bits) DataFrames against the persisted seen_shards table.
    add_df (the driver fold) must be unreachable from run_epoch; the seen
    set must still exactly match the reference."""
    from web_crawler_spark.operators import dedup as dd

    def boom(self, df, url_col="url"):
        raise AssertionError("driver-side bloom fold called in engine path")
    monkeypatch.setattr(dd.BloomShards, "add_df", boom)
    wd = str(tmp_path / "lake-driverfree")
    # compact_after=1 also exercises the or_merge compaction path in-run
    eng = run_engine(spark, wd, web, bloom_min_articles=0,
                     seen_shards_compact_after=1)
    got = {r.url for r in eng.articles.read(spark).select("url").collect()}
    assert got == {a["url"] for a in golden["articles"]}
    assert eng.seen_shards.meta()["capacity"] >= 100_000
    assert len(eng.seen_shards.committed_epochs()) >= 1

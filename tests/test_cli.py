"""CLI shell (reference cli.py/main.py analog): every subcommand drives the
already-oracle-gated library queries; these tests pin the arg parsing, the
table plumbing, and the formatted output contract."""

import argparse
import io

import pytest
from pyspark.sql import functions as F

from web_crawler_spark import cli, html_synth
from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    web = html_synth.synth_web(n_articles=80, n_hosts=4, seed=21)
    wd = str(tmp_path_factory.mktemp("cli-lake"))
    eng = CrawlEngine(spark, wd, html_synth.pages_df(spark, web),
                      CrawlConfig())
    eng.run(html_synth.seeds_df(spark, web), max_epochs=4)
    return wd, eng.articles.read(spark).count()


def _ns(workdir, **kw):
    return argparse.Namespace(workdir=workdir, **kw)


def test_cli_sources_lists_counts(spark, lake):
    wd, n_articles = lake
    out = io.StringIO()
    cli.cmd_sources(spark, _ns(wd), out=out)
    text = out.getvalue()
    assert "ID" in text and "Articles" in text
    # per-source counts printed sum to the stored article count
    counts = [int(ln.split()[2]) for ln in text.splitlines()
              if ln and ln[0].isdigit()]
    assert sum(counts) == n_articles


def test_cli_articles_and_source_filter(spark, lake):
    wd, _ = lake
    out = io.StringIO()
    cli.cmd_articles(spark, _ns(wd, limit=5, source=None), out=out)
    text = out.getvalue()
    assert "most recent articles" in text
    assert text.count("URL: ") == 5
    out2 = io.StringIO()
    cli.cmd_articles(spark, _ns(wd, limit=5, source=999999), out=out2)
    assert "No articles found." in out2.getvalue()


def test_cli_search_keyword_and_dates(spark, lake):
    wd, _ = lake
    out = io.StringIO()
    cli.cmd_search(spark, _ns(wd, keyword="spark", limit=3,
                              start_date=None, end_date=None), out=out)
    assert "articles matching 'spark'" in out.getvalue()
    out2 = io.StringIO()
    cli.cmd_search(spark, _ns(wd, keyword="zzz-no-such-kw", limit=3,
                              start_date="2024-01-01", end_date="2024-01-02"),
                   out=out2)
    assert ("No articles found matching 'zzz-no-such-kw' "
            "(from 2024-01-01 to 2024-01-02)." in out2.getvalue())


def test_cli_stats_totals(spark, lake):
    wd, n_articles = lake
    out = io.StringIO()
    cli.cmd_stats(spark, _ns(wd, today=None, week_ago=None), out=out)
    assert f"Total articles: {n_articles}" in out.getvalue()
    # frontier delta-state observability rides the same command
    assert "Frontier (merge-on-read):" in out.getvalue()
    assert "tombstones:" in out.getvalue()


def test_cli_parser_maps_reference_commands():
    p = cli.setup_parser()
    a = p.parse_args(["--workdir", "/tmp/x", "search", "-k", "spark",
                      "--from", "2024-01-01", "--to", "2024-02-01"])
    assert (a.command, a.keyword, a.start_date, a.end_date) == \
        ("search", "spark", "2024-01-01", "2024-02-01")
    a = p.parse_args(["crawl", "--from", "1", "--to", "100"])
    assert cli._parse_range_value(a.start_date) == (True, 1)
    assert cli._parse_range_value(a.end_date) == (True, 100)
    assert cli._parse_range_value("2024-11-15") == (False, "2024-11-15")


def test_cli_crawl_then_query_roundtrip(spark, tmp_path):
    """main.py analog end-to-end: crawl a synthetic web into a fresh
    workdir, then the query commands see the stored articles."""
    wd = str(tmp_path / "cli-crawl")
    cli.cmd_crawl(spark, _ns(wd, start_date=None, end_date=None, pages=None,
                             seeds=None, n_docs=300, epochs=3,
                             request_delay=1.0), out=io.StringIO())
    out = io.StringIO()
    cli.cmd_stats(spark, _ns(wd, today=None, week_ago=None), out=out)
    text = out.getvalue()
    n = int([ln for ln in text.splitlines()
             if ln.startswith("Total articles:")][0].split(":")[1])
    assert n > 0


def test_cli_crawl_page_range_limits_seeds(spark, tmp_path):
    """Page-number --from/--to (main.py:156-168 semantics) crawl only the
    selected slice of seed list pages — fewer articles than the full run,
    and a mixed page/date pair is page-based (date ignored), as in the
    reference."""
    full = str(tmp_path / "full")
    sliced = str(tmp_path / "sliced")
    base = dict(pages=None, seeds=None, n_docs=300, epochs=3,
                request_delay=1.0)
    cli.cmd_crawl(spark, _ns(full, start_date=None, end_date=None, **base),
                  out=io.StringIO())
    cli.cmd_crawl(spark, _ns(sliced, start_date="1", end_date="2", **base),
                  out=io.StringIO())
    from web_crawler_spark.plans.epoch import ARTICLES_DDL
    from web_crawler_spark.sources.tables import LakeTable
    n_full = LakeTable(full + "/articles", ARTICLES_DDL).read(spark).count()
    n_sliced = LakeTable(sliced + "/articles", ARTICLES_DDL) \
        .read(spark).count()
    assert 0 < n_sliced < n_full

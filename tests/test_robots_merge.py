"""robots.txt broadcast map + LakeTable MERGE upsert."""

from pyspark.sql import functions as F

from web_crawler_spark.operators import robots
from web_crawler_spark.sources.tables import LakeTable

ROBOTS = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""


def test_parse_robots_sections():
    delay, dis = robots.parse_robots(ROBOTS)
    assert delay == 2.5
    assert dis == ["/private/", "/tmp"]
    delay_e, dis_e = robots.parse_robots(ROBOTS, agent="EvilBot")
    assert dis_e == ["/"]
    assert robots.parse_robots("") == (0.0, [])


def test_robots_rules_df_and_filter(spark):
    pages = spark.createDataFrame(
        [("h1.com", ROBOTS), ("h2.com", None)],
        schema="host string, body string")
    rules = robots.collect_rules(robots.robots_rules_df(pages))
    assert rules["h1.com"] == (2.5, ["/private/", "/tmp"])
    assert rules["h2.com"] == (0.0, [])
    frontier = spark.createDataFrame(
        [("https://h1.com/private/x", "h1.com"),
         ("https://h1.com/tmpfile", "h1.com"),      # prefix match, no slash
         ("https://h1.com/news/a", "h1.com"),
         ("https://h2.com/private/x", "h2.com")],   # h2 has no rules
        schema="url string, host string")
    kept = {r.url for r in robots.filter_allowed(frontier, rules).collect()}
    assert kept == {"https://h1.com/news/a", "https://h2.com/private/x"}
    assert robots.host_delays(rules, default_delay=1.0) == {"h1.com": 2.5}


def test_engine_respects_robots(spark, tmp_path):
    """Disallowed article URLs are never fetched and robots Crawl-delay
    stretches the host's politeness schedule."""
    from web_crawler_spark import html_synth
    from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine
    web = html_synth.synth_web(n_articles=40, n_hosts=3, seed=7)
    pages = html_synth.pages_df(spark, web, n_partitions=4)
    seeds = html_synth.seeds_df(spark, web)
    hot = web["hosts"][0]
    rules = {hot: (0.0, ["/news/"])}     # ban all articles on the hot host
    eng = CrawlEngine(spark, str(tmp_path / "lake"), pages,
                      CrawlConfig(robots_rules=rules))
    eng.run(seeds, max_epochs=3)
    arts = eng.articles.read(spark)
    assert arts.count() > 0
    banned = arts.filter(F.col("url").contains(hot)).count()
    assert banned == 0


def test_laketable_merge_upsert(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), "k string, v string")
    df = lambda rows: spark.createDataFrame(rows, schema="k string, v string")
    t.merge(spark, df([("a", "1"), ("b", "1")]), "k", 0)
    t.merge(spark, df([("b", "2"), ("c", "2")]), "k", 1)
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {"a": "1", "b": "1", "c": "2"}   # existing row wins

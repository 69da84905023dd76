"""The reference's query surface (CLI + Database methods) as DataFrame fns.

Reference: app/cli.py + app/models/database.py query methods. Each function
takes DataFrames (articles fact + sources dim) and returns a DataFrame; the
sources side is always broadcast (it is a tiny registry — J1/J2 mapping,
SURVEY.md §2.4). Top-k queries rely on Spark's TakeOrderedAndProject (no
full sort). Deterministic total order: every ORDER BY ends with a unique
key so LIMIT is reproducible under parallelism (the reference's SQLite gets
this from its rowid implicitly).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def active_sources(sources: DataFrame) -> DataFrame:
    """S1 — SELECT * FROM sources WHERE is_active=1 (database.py:127-132)."""
    return sources.filter(F.col("is_active") == 1)


def recent_articles(articles: DataFrame, limit: int = 10) -> DataFrame:
    """O1 — ORDER BY published_date DESC LIMIT n (database.py:231-237)."""
    return (articles
            .orderBy(F.col("published_date").desc_nulls_last(),
                     F.col("url").desc())
            .limit(limit))


def latest_with_source(articles: DataFrame, sources: DataFrame,
                       limit: int = 10) -> DataFrame:
    """J1 — articles ⋈ sources broadcast join + top-k (database.py:257-268)."""
    return (articles.join(broadcast(sources.select(
                F.col("id").alias("source_id"),
                F.col("name").alias("source_name"))), "source_id")
            .orderBy(F.col("published_date").desc_nulls_last(),
                     F.col("url").desc())
            .limit(limit))


def search(articles: DataFrame, sources: DataFrame, keyword: str,
           start_date: Optional[str] = None, end_date: Optional[str] = None,
           limit: int = 50) -> DataFrame:
    """J2 — keyword LIKE over title/content + optional date range + top-k
    (database.py:270-299). LIKE pattern is %kw% on both columns."""
    kw = f"%{keyword}%"
    df = articles.filter(F.col("title").like(kw) | F.col("content").like(kw))
    if start_date:
        df = df.filter(F.col("published_date") >= start_date)
    if end_date:
        df = df.filter(F.col("published_date") <= end_date)
    return (df.join(broadcast(sources.select(
                F.col("id").alias("source_id"),
                F.col("name").alias("source_name"))), "source_id")
            .orderBy(F.col("published_date").desc_nulls_last(),
                     F.col("url").desc())
            .limit(limit))


def count_by_source(articles: DataFrame) -> DataFrame:
    """A1 — COUNT(*) GROUP BY source_id (database.py:250-255); partial agg
    map-side, single shuffle on source_id."""
    return articles.groupBy("source_id").agg(F.count("*").alias("n_articles"))


def count_total(articles: DataFrame) -> DataFrame:
    """A2 — SELECT COUNT(*) (database.py:301-306)."""
    return articles.agg(F.count("*").alias("n_articles"))


def count_scraped_on(articles: DataFrame, date: str) -> DataFrame:
    """A3 — WHERE DATE(scraped_date)=? (database.py:308-316)."""
    return (articles.filter(F.to_date(F.col("scraped_date")) == date)
            .agg(F.count("*").alias("n_articles")))


def count_scraped_since(articles: DataFrame, date: str) -> DataFrame:
    """A4 — WHERE DATE(scraped_date)>=? (database.py:318-326)."""
    return (articles.filter(F.to_date(F.col("scraped_date")) >= date)
            .agg(F.count("*").alias("n_articles")))


def count_by_source_name(articles: DataFrame, sources: DataFrame) -> DataFrame:
    """A5 — join + GROUP BY s.name (README.md:114-117) — ONE shuffle: the
    broadcast join keeps articles un-shuffled; only the group-by aggregates."""
    return (articles.join(broadcast(sources.select(
                F.col("id").alias("source_id"),
                F.col("name").alias("source_name"))), "source_id")
            .groupBy("source_name").agg(F.count("*").alias("n_articles")))


def stats(articles: DataFrame) -> DataFrame:
    """cli.py:110-136 cmd_stats — one pass, no N+1 loop: single aggregation
    replaces the reference's per-source query loop (cli.py:58-76)."""
    return articles.agg(
        F.count("*").alias("total_articles"),
        F.countDistinct("source_id").alias("n_sources"),
        F.min("published_date").alias("min_published"),
        F.max("published_date").alias("max_published"))

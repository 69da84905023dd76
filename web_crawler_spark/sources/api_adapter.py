"""REST-API source adapter (S7/S8/P14): paginated JSON → article rows.

Reference: the NewsAPI fetcher (/root/reference/app/api/newsapi_fetcher.py)
pulls `/everything?page=N` pages 1..max (181-249, 251-302), transforms each
JSON article dict to the internal schema (136-179: source_name from
article.source.name, ISO date → YYYY-MM-DD at 90-100, content fallback
description at 158-166), and drops rows without url/title (236-238).

Spark-first mapping: pagination is a `spark.range(1, pages+1)` fan-out; each
page's JSON body is a row; `from_json` with an explicit schema +
`posexplode` turns pages into articles entirely JVM-side (no Python in the
hot path — the only UDF anywhere near this source is nothing at all). In the
sandbox the HTTP GET is replaced by a supplied (page → json body) DataFrame;
on a live cluster the fetch happens in a mapInArrow batch per partition with
the same politeness budget as the crawl path (api/base_fetcher.py:74-81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, StringType, StructField, StructType)

# NewsAPI /everything response schema (newsapi_fetcher.py:172-179 fields)
ARTICLE_JSON_SCHEMA = ArrayType(StructType([
    StructField("source", StructType([StructField("name", StringType())])),
    StructField("author", StringType()),
    StructField("title", StringType()),
    StructField("description", StringType()),
    StructField("url", StringType()),
    StructField("publishedAt", StringType()),
    StructField("content", StringType()),
]))

RESPONSE_SCHEMA = StructType([
    StructField("status", StringType()),
    StructField("articles", ARTICLE_JSON_SCHEMA),
])


def articles_from_json_pages(pages: DataFrame, body_col: str = "body",
                             page_col: str = "page") -> DataFrame:
    """(page, body:json-string) → one row per article in page order.

    Column mapping replicates _transform_article
    (newsapi_fetcher.py:136-179):
      * source_name  ← source.name
      * published_date ← publishedAt ISO8601 → 'yyyy-MM-dd' (null on bad)
      * content ← content, falling back to description (:158-166)
      * summary ← description
      * rows without url or title dropped (:236-238)
    discovered_seq = page*10^6 + position keeps the reference's strict
    page-then-listing order (fetch_all_articles loop, :251-302).
    """
    parsed = pages.select(
        F.col(page_col).cast("bigint").alias("page"),
        F.from_json(F.col(body_col), RESPONSE_SCHEMA).alias("r"))
    parsed = parsed.filter(F.col("r.status") == "ok")
    arts = parsed.select(
        "page", F.posexplode_outer("r.articles").alias("pos", "a"))
    iso = F.to_timestamp(F.regexp_replace(F.col("a.publishedAt"),
                                          "Z$", "+00:00"))
    out = arts.select(
        F.col("a.url").alias("url"),
        F.col("a.title").alias("title"),
        F.coalesce(F.col("a.content"), F.col("a.description"))
         .alias("content"),
        F.col("a.author").alias("author"),
        F.col("a.source.name").alias("source_name"),
        F.date_format(iso, "yyyy-MM-dd").alias("published_date"),
        F.col("a.description").alias("summary"),
        (F.col("page") * 1_000_000 + F.col("pos")).alias("discovered_seq"))
    return out.filter(F.col("url").isNotNull() & F.col("title").isNotNull() &
                      (F.col("title") != ""))

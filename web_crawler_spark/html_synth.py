"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

Authoritative input shape (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Two generators:

* :func:`synth_web` — standalone seeded mini-web (archive/list pages +
  article pages across Zipf-skewed hosts) used by pytest golden tests and
  the crawl benchmark. Shapes mirror the reference parser targets
  (FIXTURES.md §1; /root/reference/app/parsers/rbc_ukraine_parser.py:117-179).

* :func:`pages_from_documents` — distributed construction of a pages table
  from the driver-provided ``documents`` parquet, built entirely with
  JVM-side column expressions (no UDF, no collect) so the DuckDB oracle can
  state the expected extraction output in pure SQL. This scales: at 100 TB
  the same expressions run as whole-stage-codegen over the source scan.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import refspec

EPOCH_TS = _dt.datetime(2024, 1, 1)


# ---------------------------------------------------------------------------
# Standalone seeded mini-web (pure Python; used for goldens + bench input)
# ---------------------------------------------------------------------------

_WORDS = ("spark shuffle frontier crawl parse fetch host page article title "
          "news data table row batch epoch queue filter bloom hash salt skew "
          "text index token quality dedup scale cluster executor partition").split()


def _zipf_host(rng: random.Random, n_hosts: int) -> int:
    """One hot host takes ~30% of URLs (FIXTURES.md scale knob)."""
    if rng.random() < 0.30:
        return 0
    return 1 + rng.randrange(n_hosts - 1)


def synth_web(n_articles: int = 200, n_hosts: int = 8, seed: int = 42,
              days: int = 5, dup_frac: float = 0.15,
              broken_frac: float = 0.05) -> Dict[str, object]:
    """Build {url: html_bytes} plus seed list and metadata.

    Every host gets one archive page per day listing its article links
    (relative hrefs, duplicates, uppercase/query/fragment noise for the
    canonicalizer), and one page per article. ~broken_frac articles have no
    title (parser must drop them, rbc_ukraine_parser.py:163-165).
    """
    rng = random.Random(seed)
    pages: Dict[str, bytes] = {}
    hosts = [f"www.h{i}.rbc.ua" if i == 0 else f"www.h{i}.news.example"
             for i in range(n_hosts)]
    per_day_links: Dict[Tuple[int, str], List[Tuple[str, str]]] = {}
    articles_meta = []

    for aid in range(n_articles):
        h = _zipf_host(rng, n_hosts)
        day = rng.randrange(days)
        date = (EPOCH_TS + _dt.timedelta(days=day)).strftime("%Y/%m/%d")
        url = f"https://{hosts[h]}/news/a{aid}"
        n_paras = rng.randrange(1, 5)
        paras = []
        for _ in range(n_paras):
            toks = [rng.choice(_WORDS) for _ in range(rng.randrange(5, 30))]
            # nested inline tags + entities (FIXTURES.md §1): exercises
            # get_text over descendants and charref decoding
            r = rng.random()
            if r < 0.25 and len(toks) > 2:
                toks[1] = f"<strong>{toks[1]}</strong>"
            elif r < 0.4 and len(toks) > 3:
                toks[2] = f'<a href="/news/x{aid}"><em>{toks[2]}</em></a>'
            if rng.random() < 0.2:
                toks.append("A&amp;B &lt;tag&gt;")
            paras.append(f"<p>{' '.join(toks)}</p>")
        if rng.random() < 0.25:
            paras.insert(rng.randrange(len(paras) + 1), "<p>   </p>")  # empty para
        title = "" if rng.random() < broken_frac else \
            f"Article {aid} about {rng.choice(_WORDS)}"
        body = (f'<html><body><h1 class="article__title">{title}</h1>'
                f'<div class="article__text">{"".join(paras)}</div></body></html>')
        pages[url] = body.encode("utf-8")
        hhmm = f"{rng.randrange(24):02d}:{rng.randrange(60):02d}"
        per_day_links.setdefault((h, date), []).append((f"/news/a{aid}", hhmm))
        articles_meta.append({"url": url, "host": hosts[h],
                              "date": date.replace("/", "-"), "aid": aid})

    seeds: List[Tuple[str, int, str]] = []
    sid = 0
    for h in range(n_hosts):
        for day in range(days):
            date = (EPOCH_TS + _dt.timedelta(days=day)).strftime("%Y/%m/%d")
            links = per_day_links.get((h, date))
            if not links:
                continue
            items = []
            for href, hhmm in links:
                items.append(f'<div><a href="{href}">'
                             f'<span class="time">{hhmm}</span> item</a></div>')
                if rng.random() < dup_frac:     # duplicate link on page
                    items.append(f'<div><a href="{href}">'
                                 f'<span class="time">{hhmm}</span> dup</a></div>')
            # a link that fails the '/news/' predicate + a fragment/query-noise link
            items.append('<div><a href="/pro/skip-me">promo</a></div>')
            if links:
                href0 = links[0][0]
                items.append(f'<div><a href="HTTPS://{hosts[h].upper()}{href0}'
                             f'?z=1&a=2#frag"><span class="time">00:00</span> noisy</a></div>')
            archive_url = f"https://{hosts[h]}/rus/archive/{date}"
            pages[archive_url] = (f'<html><body><div class="newsline">'
                                  f'{"".join(items)}</div></body></html>').encode()
            seeds.append((archive_url, sid, "rbc"))
            sid += 1
    return {"pages": pages, "seeds": seeds, "hosts": hosts,
            "articles_meta": articles_meta}


def web_to_pages_rows(web: Dict[str, object]) -> List[Tuple]:
    """pages dict → rows of the input_hint schema (url, warc_ts, html, text, lang)."""
    rows = []
    for i, (url, html) in enumerate(sorted(web["pages"].items())):
        art = refspec.extract_article(html, "rbc")
        text = refspec.normalize_content(art["content"]) if art else None
        ts = EPOCH_TS + _dt.timedelta(seconds=i)
        rows.append((url, ts, bytearray(html), text, "en"))
    return rows


def pages_df(spark: SparkSession, web: Dict[str, object],
             n_partitions: int = 8) -> DataFrame:
    return spark.createDataFrame(
        web_to_pages_rows(web),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    ).repartition(n_partitions, "url")


def seeds_df(spark: SparkSession, web: Dict[str, object]) -> DataFrame:
    rows = [(u, s, p, i) for i, (u, s, p) in enumerate(web["seeds"])]
    return spark.createDataFrame(
        rows, schema="url string, source_id bigint, parser_class string, priority int")


# ---------------------------------------------------------------------------
# Distributed pages construction from the driver's `documents` table
# ---------------------------------------------------------------------------

N_HOSTS_DOCS = 20

_ESCAPED_TEXT = F.translate  # placeholder for readability


def _escape(col):
    # mirror html escaping; oracle SQL performs the inverse-by-construction
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;")


def _host_id(doc_id):
    """Zipf-ish skew: ~30% of docs land on host 0 (hot host)."""
    return F.when(F.pmod(doc_id, F.lit(10)) < 3, F.lit(0)) \
            .otherwise(F.lit(1) + F.pmod(doc_id, F.lit(N_HOSTS_DOCS - 1)))


def doc_urls(docs: DataFrame) -> DataFrame:
    """Derive (doc_id, host, url_canon, url_raw, pub_date) — pure expressions."""
    d = docs.select("doc_id", "text", "lang")
    host = F.concat(F.lit("www.h"), _host_id(F.col("doc_id")).cast("string"),
                    F.lit(".example.com"))
    url_canon = F.concat(F.lit("https://"), host, F.lit("/news/d"),
                         F.col("doc_id").cast("string"), F.lit("?a=1&b=2"))
    # raw form carries canonicalizer fodder: uppercase scheme+host, unsorted
    # query, fragment
    url_raw = F.concat(F.lit("HTTPS://"), F.upper(host), F.lit("/news/d"),
                       F.col("doc_id").cast("string"), F.lit("?b=2&a=1#ref"))
    pub_date = F.date_format(
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.col("doc_id"), F.lit(60)).cast("int")),
        "yyyy-MM-dd")
    return d.select("doc_id", "text", "lang", host.alias("host"),
                    url_canon.alias("url_canon"), url_raw.alias("url_raw"),
                    pub_date.alias("pub_date"))


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages table of input_hint shape derived from documents.parquet.

    html embeds the document text as paragraph 1 (plus an empty paragraph and
    a deterministic trailer paragraph), so the expected post-extraction,
    post-normalization content is SQL-expressible:
        trim(text) || chr(10) || 'End of document ' || doc_id || '.'
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = doc_urls(docs)
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit('<html><body><h1 class="article__title">'), title,
        F.lit('</h1><div class="article__text"><p>'), _escape(F.col("text")),
        F.lit('</p><p>   </p><p>End of document '),
        F.col("doc_id").cast("string"), F.lit('.</p></div></body></html>'))
    expected_text = F.concat(
        F.trim(F.col("text")), F.lit("\nEnd of document "),
        F.col("doc_id").cast("string"), F.lit("."))
    return u.select(
        F.col("url_canon").alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        expected_text.alias("text"),
        F.col("lang"),
    )


def synth_pages_range(spark: SparkSession, n_docs: int, n_hosts: int = 256,
                      n_partitions: int = 64, para_repeat: int = 6
                      ) -> DataFrame:
    """Deterministic pages table from spark.range — no driver data, no UDF,
    whole-stage-codegen all the way to the parquet write. Used by the
    scaling benchmark, where both parallelism levels must see byte-identical
    input. ~30% of docs land on host 0 (Zipf-ish hot-host skew, same knob as
    _host_id) so the bench exercises the skew path too."""
    d = spark.range(0, n_docs, 1, n_partitions).withColumnRenamed("id", "doc_id")
    host = F.concat(
        F.lit("www.s"),
        F.when(F.pmod(F.col("doc_id"), F.lit(10)) < 3, F.lit(0))
         .otherwise(F.lit(1) + F.pmod(F.col("doc_id"), F.lit(n_hosts - 1)))
         .cast("string"),
        F.lit(".example.com"))
    # deterministic pseudo-text: repeated word salad keyed by doc_id
    words = F.concat_ws(
        " ", *[F.concat(F.lit(w + "-"),
                        F.pmod(F.col("doc_id") + i, F.lit(997)).cast("string"))
               for i, w in enumerate(_WORDS[:12])])
    para = F.concat(F.lit("<p>"), words, F.lit("</p>"))
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit('<html><body><h1 class="article__title">'), title,
        F.lit('</h1><div class="article__text">'),
        F.concat_ws("", F.array_repeat(para, para_repeat)),
        F.lit('<p>   </p><p>End of document '),
        F.col("doc_id").cast("string"), F.lit('.</p></div></body></html>'))
    url = F.concat(F.lit("https://"), host, F.lit("/news/d"),
                   F.col("doc_id").cast("string"), F.lit("?a=1&b=2"))
    url_raw = F.concat(F.lit("HTTPS://"), F.upper(host), F.lit("/news/d"),
                       F.col("doc_id").cast("string"), F.lit("?b=2&a=1#x"))
    return d.select(
        F.col("doc_id"), url.alias("url"), url_raw.alias("url_raw"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"))


def archive_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One archive/list page per (host, pub_date) listing that day's article
    links in doc_id order — exercises link extraction + explode (U1) with a
    SQL-stateable expected output. Built with groupBy + concat_ws (JVM-side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = doc_urls(docs)
    item = F.concat(F.lit('<div><a href="/news/d'), F.col("doc_id").cast("string"),
                    F.lit('?a=1&b=2"><span class="time">09:00</span> item</a></div>'))
    per_day = (u.select("host", "pub_date", "doc_id", item.alias("item"))
               .groupBy("host", "pub_date")
               .agg(F.concat_ws("", F.array_sort(
                   F.collect_list(F.struct("doc_id", "item"))).getField("item"))
                   .alias("items")))
    archive_url = F.concat(F.lit("https://"), F.col("host"), F.lit("/rus/archive/"),
                           F.regexp_replace("pub_date", "-", "/"))
    html = F.concat(F.lit('<html><body><div class="newsline">'), F.col("items"),
                    F.lit('</div></body></html>'))
    return per_day.select(
        archive_url.alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )

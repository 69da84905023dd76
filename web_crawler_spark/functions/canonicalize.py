"""URL canonicalization / absolutization as Arrow-batched pandas UDFs.

North-rule canonicalizer: scheme/host lowercase, query sort, fragment strip —
a superset of the reference's urljoin + validity check
(/root/reference/app/scrapers/base_crawler.py:91-101). Per-row logic lives in
``refspec`` (shared with the golden oracle); here it is vectorized over
pandas Series inside Arrow batches, so the executor-side cost is one Python
call per ~10k rows, not per row.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import refspec

# UDFs are created lazily (DDL return-type parsing needs an active session)
# and cached so Catalyst sees one function identity per process.


@lru_cache(maxsize=1)
def canonicalize_udf():
    @pandas_udf("string")
    def _canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: refspec.canonicalize_url(u) if u else None)
    return _canon


@lru_cache(maxsize=1)
def host_udf():
    @pandas_udf("string")
    def _host(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: refspec.url_host(u) if u else None)
    return _host


@lru_cache(maxsize=1)
def canon_host_udf():
    """url → struct(url_canon, host) in ONE Arrow pass.

    Marked nondeterministic on purpose: it is pure, but the flag stops
    Catalyst from duplicating the evaluation when a downstream null-filter is
    pushed through the projection (observed: 3× UDF evaluation of the
    canonicalizer in the epoch plan without it)."""
    @pandas_udf("struct<url_canon:string, host:string>")
    def _ch(urls: pd.Series) -> pd.DataFrame:
        canon_urls = urls.map(
            lambda u: refspec.canonicalize_url(u) if u else None)
        hosts = canon_urls.map(lambda u: refspec.url_host(u) if u else None)
        return pd.DataFrame({"url_canon": canon_urls, "host": hosts})
    return _ch.asNondeterministic()


@lru_cache(maxsize=1)
def absolutize_udf():
    @pandas_udf("string")
    def _abs(base: pd.Series, href: pd.Series) -> pd.Series:
        out = []
        for b, h in zip(base, href):
            if h is None:
                out.append(None)
                continue
            u = refspec.absolute_url(b or "", h)
            out.append(u if refspec.is_valid_url(u) else None)
        return pd.Series(out, dtype="object")
    return _abs


def with_canonical(df, url_col: str = "url") -> "DataFrame":
    """Add url_canon + host columns; drop rows that fail validity (P2).
    One Arrow evaluation per row total (see canon_host_udf)."""
    return (df
            .withColumn("__ch", canon_host_udf()(F.col(url_col)))
            .withColumn("url_canon", F.col("__ch.url_canon"))
            .withColumn("host", F.col("__ch.host"))
            .drop("__ch")
            .filter(F.col("url_canon").isNotNull()))


def host_salt(host_col: Column, hot_hosts_salts, n_salt: int = 8) -> Column:
    """Salted partition key to break hot-domain skew (north_rule).

    ``hot_hosts_salts`` is a broadcast-able map {host: n_sub} built from per
    -epoch host counts; cold hosts keep salt 0 (single partition â€” politeness
    order preserved), hot hosts fan out into n_sub sub-keys. The salt must be
    deterministic per URL so retries land on the same sub-partition: we use
    xxhash64(url) % n_sub.
    """
    expr = F.lit(0)
    for h, n in hot_hosts_salts.items():
        expr = F.when(host_col == h,
                      F.pmod(F.xxhash64(F.col("url_canon")), F.lit(int(n)))
                      ).otherwise(expr)
    return expr.cast("int")

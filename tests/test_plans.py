"""Physical-plan discipline guards: predicate pushdown and column pruning
must reach the parquet scans, and the only Python in any plan must be
Arrow-batched (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas —
never row-at-a-time BatchEvalPython). These pin the properties the
100 TB story depends on, so a refactor can't silently regress them."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    from web_crawler_spark.driver_queries import QUERIES
    plan = _plan(QUERIES["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    plan = _plan(QUERIES["search_documents"](spark, SF_DIR))
    # LIKE '%spark%' pushes as StringContains
    assert "StringContains" in plan


def test_column_pruning_reaches_scan(spark):
    from web_crawler_spark.driver_queries import QUERIES
    plan = _plan(QUERIES["quality_scores"](spark, SF_DIR))
    # the documents scan must read only (doc_id, text) — not lang/source
    seg = plan.split("ReadSchema")[1][:300]
    assert "doc_id" in seg and "text" in seg
    assert "lang" not in seg and "source" not in seg


def test_no_row_at_a_time_python_anywhere(spark):
    """Every Python boundary in every driver query is Arrow-batched."""
    from web_crawler_spark.driver_queries import QUERIES
    for name in ("crawl_extract", "crawl_discover", "canonicalize_urls",
                 "multimodal_features", "simhash_near_dup",
                 "winnow_fingerprints", "lsh_cosine_buckets"):
        plan = _plan(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name


def test_topk_compiles_to_take_ordered(spark):
    from web_crawler_spark.driver_queries import QUERIES
    plan = _plan(QUERIES["recent_events_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_small_dim_join_broadcasts(spark):
    from web_crawler_spark.driver_queries import QUERIES
    plan = _plan(QUERIES["articles_recent"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

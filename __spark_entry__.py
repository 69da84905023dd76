"""Driver contract for the spark-graft builder (PySpark target).

entry() — flagship crawl-extract pipeline on sf0.001.
queries()/oracle_sql() — one entry per operator family from SURVEY.md §2
plus the training-data-pipeline ops; implementations live in
web_crawler_spark/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_crawler_spark.driver_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: canonicalize → fetch-join → Arrow parse UDF →
    normalized articles, on the sf0.001 documents-derived pages table."""
    return QUERIES["crawl_extract"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

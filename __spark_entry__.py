"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame callables.
oracle_sql()   — matching DuckDB SQL for the correctness gate.

Implementation lives in predictor_spark/plans/catalog.py; this module is a
thin stable shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from predictor_spark.plans.catalog import QUERIES

    return QUERIES["flagship_persistence_metrics"](spark, "/root/testdata/sf0.001")


def _load_catalog():
    # importing the catalog modules populates the QUERIES/ORACLE registries
    import predictor_spark.plans.catalog as catalog
    import predictor_spark.plans.catalog_text  # noqa: F401

    for mod in ("catalog_streaming", "catalog_multimodal", "catalog_forecast",
                "catalog_analytics", "catalog_mllib", "catalog_parity"):
        try:
            __import__(f"predictor_spark.plans.{mod}")
        except ImportError:
            pass
    return catalog


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_load_catalog().QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_load_catalog().ORACLE)

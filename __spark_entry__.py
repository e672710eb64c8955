"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every declared capability (one per SURVEY.md §2
inventory row / extension operator); ``oracle_sql()`` gives the DuckDB
twin for the differential correctness gate.

The real inventory lives in
``real_time_e_commerce_analytics_lakehouse_spark/plans/`` — this module is
a thin adapter over that registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from real_time_e_commerce_analytics_lakehouse_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the revenue mart (reference
    db_notebooks/07_gold_metrics_revenue.py:26-65 re-expressed): fact ⋈ dim
    ⋈ dim with a multi-key group-aggregate.
    """
    return QUERIES["revenue_by_nation_status"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}

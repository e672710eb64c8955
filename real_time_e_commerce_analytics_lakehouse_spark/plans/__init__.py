"""Declared query inventory: every engine capability as a (Spark, oracle-SQL) pair."""

from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    QUERIES,
    Query,
    register,
)

# importing the modules populates QUERIES
from real_time_e_commerce_analytics_lakehouse_spark.plans import advanced as _advanced  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import core as _core  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import curation as _curation  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import documents as _documents  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import embeddings as _embeddings  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import events as _events  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import extras as _extras  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import more as _more  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import scale as _scale  # noqa: E402,F401
from real_time_e_commerce_analytics_lakehouse_spark.plans import tpch as _tpch  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "register"]

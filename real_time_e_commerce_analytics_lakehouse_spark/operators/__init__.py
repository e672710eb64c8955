"""Reusable operators: the reference's recurring patterns, made declarative.

The reference hand-copies ~5 patterns across 9 notebooks (SURVEY §7); each
is implemented once here, plus the scale-path operators Spark lacks natively.
"""

from real_time_e_commerce_analytics_lakehouse_spark.operators.cleaning import CleanSpec, clean
from real_time_e_commerce_analytics_lakehouse_spark.operators.dedup import dedup_latest, modal_value
from real_time_e_commerce_analytics_lakehouse_spark.operators.joins import asof_join, preagg_join, range_join
from real_time_e_commerce_analytics_lakehouse_spark.operators.topk import top_k_per_group

__all__ = [
    "CleanSpec",
    "clean",
    "dedup_latest",
    "modal_value",
    "asof_join",
    "preagg_join",
    "range_join",
    "top_k_per_group",
]

from real_time_e_commerce_analytics_lakehouse_spark.streaming.pipeline import (
    IncrementalRunner,
    run_available_now,
)

__all__ = ["IncrementalRunner", "run_available_now"]

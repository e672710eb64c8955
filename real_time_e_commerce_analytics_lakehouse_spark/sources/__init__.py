from real_time_e_commerce_analytics_lakehouse_spark.sources.csv_stream import (
    bronze_csv_stream,
    discover_tables,
)

__all__ = ["bronze_csv_stream", "discover_tables"]

from real_time_e_commerce_analytics_lakehouse_spark.pipelines.olist import OlistPipeline

__all__ = ["OlistPipeline"]

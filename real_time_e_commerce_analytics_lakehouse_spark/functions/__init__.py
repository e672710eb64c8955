"""Dialect-paired expression builders.

Every LLM-data operator (dedup, langid, simhash, similarity) must be
verifiable against the DuckDB oracle, so its core expressions are
generated for BOTH dialects from one definition. Hash-dependent operators
use md5 (identical hex output in Spark and DuckDB) as the shared hash
family — MinHash and SimHash work with any uniform hash, so portability
costs nothing semantically.
"""

from real_time_e_commerce_analytics_lakehouse_spark.functions import textexpr, vecexpr

__all__ = ["textexpr", "vecexpr"]

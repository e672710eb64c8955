"""Top-K per group (scale-path extension; SURVEY §2.6 notes the reference
has no sorts/limits at all)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """row_number ≤ k within each group. Single shuffle on the group keys;
    never sorts the whole table. Callers must include tie-breakers in
    ``order_by`` for determinism."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    if rank_alias in df.columns:
        # withColumn would silently OVERWRITE the caller's column and
        # the filter would consume the replacement (r5 review) — fail
        # loudly instead
        raise ValueError(
            f"column {rank_alias!r} already exists; pass a different "
            "rank_alias"
        )
    w = W.partitionBy(*ks).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= k)
    )

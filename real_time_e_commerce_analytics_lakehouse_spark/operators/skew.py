"""Skew-handling: salted join.

AQE's skew-join handles skewed SHUFFLE joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py) — that is the
first line of defense. Salting is the manual fallback for the cases AQE
cannot fix: skewed AGGREGATIONS, and joins where one hot key dwarfs
everything (AQE splits partitions, but a single key's rows still meet in
one task on the build side of some join types).

salted_join replicates the small side `salt` times and scatters the big
side's hot keys across salt buckets: the hot key's rows land in `salt`
different tasks instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in `big`.

    big gains a random-but-deterministic salt (hash of all columns mod
    salt — no RNG, so the operator is replay-stable); small is exploded
    across all salt values. Join keys become (key..., salt). Result
    equals a plain join (verified in tests/test_operators.py).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_col = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt).alias(
        "__salt"
    )
    b = big.select("*", salt_col)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")

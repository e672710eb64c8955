"""Skew-handling: salted join, salted aggregation, skew-safe distinct.

AQE's skew-join handles skewed SHUFFLE joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py) — that is the
first line of defense. Salting is the manual fallback for the cases AQE
cannot fix: skewed AGGREGATIONS, and joins where one hot key dwarfs
everything (AQE splits partitions, but a single key's rows still meet in
one task on the build side of some join types).

- salted_join replicates the small side `salt` times and scatters the
  big side's hot keys across salt buckets: the hot key's rows land in
  `salt` different tasks instead of one.
- salted_agg runs algebraic aggregations in two phases, (key, salt) ->
  key. For plain sum/count/min/max Spark's partial (map-side) aggregation
  already bounds per-task state, so this matters for the HOLISTIC shapes:
  collect-style aggs and anything where the final exchange would put one
  hot key's entire reduce on a single task.
- two_stage_count_distinct is the classic skew-safe exact COUNT(DISTINCT)
  (Spark plans Expand + double exchange for it; the explicit two-stage
  spelling keys the first shuffle by (group, value), so a hot group's
  distinct set is built across many tasks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int):
    """Deterministic salt in [0, salt): pmod of a hash over the frame's
    HASHABLE columns. pmod, not abs(...)%: abs(Long.MIN_VALUE) overflows
    to itself and yields a negative bucket the exploded side never
    carries (a silently dropped row, r5 review). Map columns are
    excluded — xxhash64 rejects MapType, and the events table's `props`
    map made the operator crash on a standard shape; struct/array
    columns hash fine and keep the spread."""
    hashable = [
        F.col(f.name)
        for f in df.schema.fields
        if "map<" not in f.dataType.simpleString()
    ]
    if not hashable:  # all-map frame: partition-local spread still works
        hashable = [F.spark_partition_id()]
    return F.pmod(F.xxhash64(*hashable), F.lit(salt)).alias("__salt")


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
    equals a plain join (verified in tests/test_operators.py) for the
    join types where the exploded small side cannot replicate output:
    inner/left/semi/anti preserve big-side multiplicity; right/full
    would emit every UNMATCHED small row once PER SALT VALUE, so they
    are refused (same contract as operators/joins.range_join).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the salt-exploded "
            "small side would replicate unmatched rows; flip the sides or "
            "use a plain join"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = big.select("*", _salt_col(big, salt))
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")


# (agg_name, source_col) pairs a salted two-phase run can recombine:
# partial per (key, salt), then an exact final combine per key.
_COMBINABLE = {"sum", "count", "min", "max", "avg"}


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 8,
) -> DataFrame:
    """Two-phase salted groupBy: partial aggregate on (keys..., salt),
    final combine on keys. `aggs` maps output column -> (fn, source_col)
    with fn in sum/count/min/max/avg. Result is EXACTLY a plain
    groupBy(...).agg(...) (equivalence-tested); the win is that a hot
    key's reduce work spreads over `salt` tasks before the tiny final
    combine. avg recombines as sum-of-sums / sum-of-counts — not
    avg-of-avgs, which would weight salt buckets wrongly.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    for out, (fn, _c) in aggs.items():
        if fn not in _COMBINABLE:
            raise ValueError(f"{out}: {fn!r} is not a combinable aggregate")

    salt_col = _salt_col(df, salt)
    partial_exprs, final_exprs = [], []
    for out, (fn, c) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(c).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(c).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(c).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(c).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(c).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(c).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
    partial = df.select("*", salt_col).groupBy(*ks, "__salt").agg(*partial_exprs)
    return partial.groupBy(*ks).agg(*final_exprs)


def two_stage_count_distinct(
    df: DataFrame,
    keys: str | Sequence[str],
    col: str,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per key, skew-safe: stage 1 dedups on
    (keys..., col) — the shuffle key includes the VALUE, so a hot group
    spreads over the whole cluster — stage 2 counts per key. Equivalent
    to groupBy(keys).agg(countDistinct(col)) (NULLs excluded, matching
    SQL COUNT(DISTINCT))."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    # keep NULL-valued rows through the dedup so a group whose values
    # are ALL NULL still yields a row (count=0), exactly like
    # countDistinct; the final count(col) skips the NULLs itself —
    # pre-filtering dropped such groups entirely (r4 review)
    distinct = df.select(*ks, col).dropDuplicates(ks + [col])
    return distinct.groupBy(*ks).agg(F.count(F.col(col)).alias(out))

"""Declarative data-quality expectations (Delta Live Tables parity).

The reference's quality handling is implicit — try_cast + null-filters
scattered through silver (02_bronze_to_silver.py:411-425, 509-510).
DLT formalizes that as per-rule expectations with three actions; this
module provides the same contract for this engine's batch frames and
foreachBatch streams:

- ``warn``: keep the row, count the violation (DLT ``@expect``)
- ``drop``: remove the row, count it (DLT ``@expect_or_drop``)
- ``fail``: abort the batch atomically (DLT ``@expect_or_fail``) —
  folded into the plan as a raise_error guard (same zero-extra-job
  pattern as LakeTable CHECK constraints), so a bad row kills the
  write before any commit.

A row violates a rule when its expression is FALSE **or NULL** — an
expectation is an assertion of truth, so an unknown does not pass
(stricter than SQL CHECK, matching DLT's behavior).

Metrics are one tiny aggregate job per batch (sum of per-rule violation
flags — map-side combined, one single-row exchange), which is how a
100 TB pipeline affords per-batch quality telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAIL_MARK = "EXPECTATION_FAILED"

_ACTIONS = ("warn", "drop", "fail")


def apply_expectations(
    df: DataFrame,
    rules: dict[str, tuple[str, str]],
) -> tuple[DataFrame, DataFrame]:
    """Apply `{name: (sql_bool_expr, action)}` to a batch.

    Returns ``(clean, metrics)``:

    - ``clean``: rows surviving every ``drop`` rule, with ``fail``
      rules armed in-plan (evaluating a violating row raises before
      anything downstream commits). ``warn`` rules never remove rows.
    - ``metrics``: one row per rule — (rule, action, n_violations) —
      computed over the INPUT frame, so dropped rows are counted.
    """
    for name, (expr, action) in rules.items():
        if action not in _ACTIONS:
            raise ValueError(
                f"expectation {name!r}: action must be one of {_ACTIONS}, "
                f"got {action!r}"
            )

    passes = {
        name: F.coalesce(F.expr(expr), F.lit(False))
        for name, (expr, _a) in rules.items()
    }

    metrics = df.agg(
        *[
            F.coalesce(F.sum(F.when(passes[name], 0).otherwise(1)), F.lit(0))
            .cast("long")
            .alias(name)
            for name in rules
        ]
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in rules]),
                F.array(*[F.col(n) for n in rules]),
            )
        ).alias("rule", "n_violations")
    ).select(
        "rule",
        F.element_at(
            F.create_map(
                *[
                    x
                    for n, (_e, a) in rules.items()
                    for x in (F.lit(n), F.lit(a))
                ]
            ),
            F.col("rule"),
        ).alias("action"),
        "n_violations",
    )

    clean = df
    drop_conds = [passes[n] for n, (_e, a) in rules.items() if a == "drop"]
    if drop_conds:
        keep = drop_conds[0]
        for c in drop_conds[1:]:
            keep = keep & c
        clean = clean.filter(keep)
    fail_rules = [(n, e) for n, (e, a) in rules.items() if a == "fail"]
    if fail_rules:
        first = clean.columns[0]
        guard = F.col(first)
        for name, expr in fail_rules:
            msg = F.lit(
                f"{_FAIL_MARK}: expectation '{name}' ({expr}) violated"
            )
            guard = F.when(~passes[name], F.raise_error(msg)).otherwise(guard)
        clean = clean.withColumn(first, guard)
    return clean, metrics

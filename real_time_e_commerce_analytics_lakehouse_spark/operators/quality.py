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

from pyspark.sql import DataFrame, Observation
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
    if not rules:
        # "no expectations" is a legal configuration: no-op, empty
        # metrics (df.agg(*[]) would assert otherwise — r5 review)
        empty = df.sparkSession.createDataFrame(
            [], "rule string, action string, n_violations long"
        )
        return df, empty

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

    clean = _enforce(df, rules, passes)
    return clean, metrics


def _enforce(df: DataFrame, rules: dict, passes: dict) -> DataFrame:
    """Arm fail guards, then apply drop filters (shared by both
    variants).

    Fail guards are a FILTER over assert-style expressions, not a
    withColumn on the first column (r5 review): a guarded column that
    no consumer reads is eliminated by Catalyst column pruning — a
    clean.select(other_col).write would commit a batch a fail rule
    should abort. A filter's predicate must be evaluated for every row
    regardless of the projection. And they arm BEFORE the drop filters:
    a row violating both a drop rule and a fail rule must ABORT the
    batch (the metrics report the fail violation either way — DLT
    @expect_or_fail parity), not be quietly dropped first."""
    clean = df
    fail_rules = [(n, e) for n, (e, a) in rules.items() if a == "fail"]
    if fail_rules:
        pred = None
        for name, expr in fail_rules:
            msg = F.lit(
                f"{_FAIL_MARK}: expectation '{name}' ({expr}) violated"
            )
            ok = F.when(~passes[name], F.raise_error(msg)).otherwise(
                F.lit(True)
            )
            pred = ok if pred is None else (pred & ok)
        clean = clean.filter(pred)
    drop_conds = [passes[n] for n, (_e, a) in rules.items() if a == "drop"]
    if drop_conds:
        keep = drop_conds[0]
        for c in drop_conds[1:]:
            keep = keep & c
        clean = clean.filter(keep)
    return clean


def apply_expectations_observed(
    df: DataFrame,
    rules: dict[str, tuple[str, str]],
) -> tuple[DataFrame, Observation]:
    """`apply_expectations` with metrics riding the SAME Spark job as
    the data (``df.observe``): the violation counters are accumulated
    while the action that consumes ``clean`` runs — zero extra scans,
    vs the base variant's one metrics aggregate per batch. At 100 TB
    this is the difference between quality telemetry being free and it
    doubling the read.

    Returns ``(clean, observation)``. After the FIRST action on
    ``clean`` (the foreachBatch write, a collect, ...),
    ``observation.get`` yields ``{f"{rule}_violations": n}`` counted
    over the INPUT frame (the observe node sits above the drop/fail
    enforcement, so dropped rows are counted, same as the base
    variant). An action is required before reading the metrics — this
    is Spark's Observation contract."""
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
    obs = Observation("expectations")
    observed = df.observe(
        obs,
        *[
            F.coalesce(F.sum(F.when(passes[name], 0).otherwise(1)), F.lit(0))
            .cast("long")
            .alias(f"{name}_violations")
            for name in rules
        ],
    )
    # re-derive pass exprs against the observed node's columns (same
    # names; Column objects bind loosely enough to reuse)
    return _enforce(observed, rules, passes), obs

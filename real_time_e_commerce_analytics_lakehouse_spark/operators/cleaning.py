"""Declarative cleaning/conformance: the silver layer's per-table logic as a spec.

The reference hand-writes the same clean/cast/filter code per table
(db_notebooks/02_bronze_to_silver.py — 855 lines for 7 tables). The engine
replaces that with a :class:`CleanSpec` interpreted once: column transforms
(trim/case/cast/try_cast/timestamp parse), null-reject keys, domain and
range filters, defaults. Policy matches the reference exactly:

- coercion failures become NULL, never job failures (try_cast /
  try_to_timestamp — 02:411-425, 02:524-531; under Spark 4's ANSI-on
  default this requires try_cast even for the "strict" cast rules);
- rows missing mandatory keys are dropped (02:46-47, 02:596-598);
- rows outside declared domains/ranges are dropped (02:579-601, 02:517).

Everything compiles to built-in Column expressions — whole-stage codegen,
no Python in the row path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# transform atoms, applied in order
_CASE_FNS = {
    "trim": F.trim,
    "upper": F.upper,
    "lower": F.lower,
    "initcap": F.initcap,
}


@dataclass
class ColumnRule:
    """How one output column is produced.

    source: input column (defaults to the output name).
    transforms: ordered case/trim atoms from {trim, upper, lower, initcap}.
    cast: cast type name — compiles to NULL-on-failure semantics on ANY
        session (see compile()); kept distinct from try_cast for
        contract readability (which columns the spec EXPECTS to always
        parse vs. which it tolerates failing).
    try_cast: null-on-failure cast type name.
    timestamp_format: parse with try_to_timestamp(fmt).
    default: value to fill when NULL (after casts) — reference
        02:434-438 (payment_installments -> 1).
    expr: escape hatch — full Column expression (overrides the rest).
    """

    source: str | None = None
    transforms: tuple[str, ...] = ()
    cast: str | None = None
    try_cast: str | None = None
    timestamp_format: str | None = None
    default: object | None = None
    expr: Column | None = None

    def compile(self, out_name: str) -> Column:
        if self.expr is not None:
            return self.expr.alias(out_name)
        col = F.col(self.source or out_name)
        for t in self.transforms:
            col = _CASE_FNS[t](col)
        if self.timestamp_format is not None:
            col = F.try_to_timestamp(col, F.lit(self.timestamp_format))
        elif self.try_cast is not None:
            col = col.try_cast(self.try_cast)
        elif self.cast is not None:
            # try_cast UNDER THE HOOD (r5 review, runtime-verified):
            # Spark 4 defaults spark.sql.ansi.enabled=true, where a
            # plain cast RAISES on malformed input — one bad landing row
            # would kill the silver job, violating the module's "never
            # fail the job" policy, which was written against ANSI-off
            # NULL-on-failure semantics. try_cast gives the documented
            # behavior on every session; flipping ANSI off globally
            # would instead silently change overflow semantics
            # everywhere else.
            col = col.try_cast(self.cast)
        if self.default is not None:
            col = F.coalesce(col, F.lit(self.default))
        return col.alias(out_name)


@dataclass
class CleanSpec:
    """Full cleaning contract for one table."""

    columns: dict[str, ColumnRule]
    require_keys: tuple[str, ...] = ()  # post-transform not-null filter
    domains: dict[str, tuple] = field(default_factory=dict)  # col -> allowed values
    ranges: dict[str, tuple] = field(default_factory=dict)  # col -> (lo, hi) inclusive
    keep_extra: tuple[str, ...] = ()  # passthrough columns (lineage etc.)


def clean(df: DataFrame, spec: CleanSpec) -> DataFrame:
    """Apply a CleanSpec. Single projection + single conjunctive filter, so
    Catalyst pushes what it can into the scan and codegens the rest."""
    cols = [rule.compile(name) for name, rule in spec.columns.items()]
    cols += [F.col(c) for c in spec.keep_extra if c in df.columns]
    out = df.select(*cols)
    pred: Column | None = None

    def _and(p: Column | None, q: Column) -> Column:
        return q if p is None else (p & q)

    for k in spec.require_keys:
        pred = _and(pred, F.col(k).isNotNull())
    for c, values in spec.domains.items():
        pred = _and(pred, F.col(c).isin(list(values)))
    for c, (lo, hi) in spec.ranges.items():
        pred = _and(pred, F.col(c).between(lo, hi))
    return out.filter(pred) if pred is not None else out

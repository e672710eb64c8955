"""Multi-dimensional Z-order (Morton) clustering expressions.

`LakeTable.compact(cluster_by=[a, b])` range-clusters lexicographically:
files get narrow ranges on `a` but full-width ranges on every later
column — a filter on `b` alone skips nothing. Z-ordering interleaves
the bits of all clustering columns into one Morton code so every file
covers a small hyper-rectangle of the value space, and parquet footer
min/max stats (row-group skipping via pushed filters, plus the
manifest's unit-level stats) prune on ANY clustered column — the Delta
OPTIMIZE ZORDER semantics, built from plain Spark expressions:

1. normalize each column to a `bits`-wide integer grid cell
   (min/max-scaled; one tiny agg job computes the bounds), and
2. interleave the cells' bits with shift/or arithmetic — all JVM-side,
   whole-stage codegen'd, zero Python.

`bits` = 16 and <= 3 columns keeps the Morton code inside a BIGINT
(48 bits). Grid-cell granularity only decides file boundaries —
rows inside a file are exact; 2^16 cells per dimension is far finer
than any realistic file count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_KINDS = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "date",
    "timestamp", "timestamp_ntz",
)


def _as_double(col: str, dtype: str) -> Column:
    """Orderable numeric view of a column for grid normalization."""
    if dtype == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01").cast("date")).cast("double")
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    return F.col(col).cast("double")


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> Column:
    """A BIGINT Morton code over `cols` (numeric/date/timestamp; 2-3
    columns). Runs ONE small aggregate job to find per-column [min, max]
    bounds, then builds the interleave as a literal-folded expression.
    NULLs map to cell 0 (sort first, like NULLS FIRST)."""
    cols = list(cols)
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder_key needs 2-3 columns")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} x {len(cols)} cols exceeds BIGINT")
    dtypes = dict(df.dtypes)
    for c in cols:
        base = dtypes.get(c, "?").split("(")[0]
        if base not in _NUMERIC_KINDS:
            raise ValueError(
                f"zorder column {c} has type {dtypes.get(c)}; only "
                "numeric/date/timestamp columns are z-orderable (strings "
                "have no meaningful linear grid — use cluster_by instead)"
            )
    # one bounded job: global [min, max] per column over FINITE values
    # only (r5 review): Spark's min/max order NaN above every double, so
    # one NaN row made mx = NaN, the span NaN, every scaled value NaN —
    # the whole dimension silently collapsed into one grid cell and
    # z-order skipping on it vanished. With finite bounds, NaN rows
    # deterministically land in the top cell (greatest/least resolve
    # NaN as largest) and ±Inf rows clamp to the edge cells; all finite
    # rows keep their real grid.
    def _finite(e: Column) -> Column:
        return F.when(~F.isnan(e) & (F.abs(e) != float("inf")), e)

    bounds = df.agg(
        *[
            F.min(_finite(_as_double(c, dtypes[c].split("(")[0])))
            .alias(f"mn_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(_finite(_as_double(c, dtypes[c].split("(")[0])))
            .alias(f"mx_{i}")
            for i, c in enumerate(cols)
        ],
    ).collect()[0]

    n = len(cols)
    max_cell = (1 << bits) - 1
    z: Column = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        v = _as_double(c, dtypes[c].split("(")[0])
        if mn is None or mx is None or mx == mn:
            cell = F.lit(0).cast("bigint")  # constant/all-null column
        else:
            scaled = (v - F.lit(float(mn))) / F.lit(float(mx - mn)) * max_cell
            cell = F.coalesce(
                F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(max_cell)))
                .cast("bigint"),
                F.lit(0).cast("bigint"),
            )
        for b in range(bits):
            # bit b of this column lands at position b*n + i of the code
            z = z + F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("bigint")
    return z

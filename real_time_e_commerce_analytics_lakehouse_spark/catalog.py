"""SQL catalog facade over LakeTables.

The reference's users run ``spark.sql`` against Delta tables registered
in the Databricks metastore (every gold notebook: ``spark.sql`` over
``ecom_gold.*`` — e.g. 07_gold_metrics_revenue.py). This engine's
tables are path-addressed ``LakeTable``s; ``LakeCatalog`` closes the
gap by mounting snapshot reads as temp views so the full Spark SQL
surface (joins, CTEs, window functions, INSERT-free analytics) works
verbatim over them.

Freshness semantics: a view is bound to the snapshot CURRENT AT
REGISTRATION (Delta reads behave the same way — a DataFrame pins the
snapshot it was created from). ``sql()`` re-resolves every registered
table to its latest version before parsing the query, so interactive
use always sees committed data; pass ``refresh=False`` to keep the
pinned snapshots (repeatable-read across several queries).

Scale note: mounting is metadata-only — no data moves at registration;
the snapshot read behind each view is the engine's single-scan
manifest read, so predicate pushdown / partition pruning on the SQL
query flows into the scan exactly as it does for the DataFrame API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


class LakeCatalog:
    """Name -> LakeTable registry with temp-view mounting and a sql()
    entry point.

    >>> cat = LakeCatalog(spark, "/warehouse")
    >>> cat.register("orders")                  # /warehouse/orders
    >>> cat.register("dim_customer", path="/elsewhere/dim")
    >>> cat.sql("SELECT * FROM orders o JOIN dim_customer c USING (k)")
    """

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root
        self._tables: dict[str, LakeTable] = {}

    def register(
        self,
        name: str,
        path: str | None = None,
        version: int | None = None,
        timestamp: str | None = None,
        **table_kwargs,
    ) -> LakeTable:
        """Mount `name` as a temp view over the LakeTable at `path`
        (default: <root>/<name>). Re-registering rebinds the view to
        the table's current snapshot. `version`/`timestamp` pin the
        view to a time-travel snapshot (VERSION/TIMESTAMP AS OF as a
        named view — `cat.register("orders_y", "orders path",
        version=3)` makes yesterday's orders SQL-addressable next to
        today's); pinned views are excluded from refresh()/sql()'s
        latest-snapshot re-resolution."""
        if path is None:
            if self.root is None:
                raise ValueError(
                    f"register({name!r}): no path given and no catalog root"
                )
            path = os.path.join(self.root, name)
        t = self._tables.get(name)
        if t is None or t.path != path:
            t = LakeTable(self.spark, path, **table_kwargs)
        pinned = version is not None or timestamp is not None
        if pinned:
            t.read(version=version, timestamp=timestamp).createOrReplaceTempView(name)
            self._tables.pop(name, None)  # not refresh-tracked
        else:
            self._tables[name] = t
            t.read().createOrReplaceTempView(name)
        return t

    def table(self, name: str) -> LakeTable:
        return self._tables[name]

    def refresh(self, name: str | None = None) -> None:
        """Rebind view(s) to the latest committed snapshot (Delta's
        REFRESH TABLE; needed after another writer commits)."""
        names = [name] if name is not None else list(self._tables)
        for n in names:
            self._tables[n].read().createOrReplaceTempView(n)

    def sql(self, query: str, refresh: bool = True) -> DataFrame:
        """Run a Spark SQL query over the mounted views. By default
        every view is re-resolved to its table's latest version first;
        refresh=False keeps the pinned snapshots (repeatable read)."""
        if refresh:
            self.refresh()
        return self.spark.sql(query)

    def drop(self, name: str) -> None:
        """Unmount the view (the table's data is untouched)."""
        self.spark.catalog.dropTempView(name)
        self._tables.pop(name, None)

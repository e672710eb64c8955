"""Property-based tests (hypothesis): core operators vs naive Python
models on randomized inputs. Small example counts — each example builds
Spark DataFrames — but the generators hit the edge shapes that matter:
empty groups, all-duplicate keys, guard ties, unmatched keys.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.dedup import dedup_latest
from real_time_e_commerce_analytics_lakehouse_spark.operators.joins import asof_join
from real_time_e_commerce_analytics_lakehouse_spark.tables import _merge_dataframes

ROWS = st.lists(
    st.tuples(
        st.integers(0, 4),  # key
        st.integers(0, 20),  # version/ts
        st.integers(0, 99),  # payload
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@SETTINGS
def test_dedup_latest_model(spark, rows):
    df = spark.createDataFrame(rows, "k long, ver long, x long")
    got = {
        r.k: (r.ver, r.x)
        for r in dedup_latest(df, "k", "ver", tie_breakers=("x",)).collect()
    }
    model: dict[int, tuple[int, int]] = {}
    for k, ver, x in rows:
        if k not in model or (ver, x) > model[k]:
            model[k] = (ver, x)
    assert got == model


@given(target=ROWS, source=ROWS)
@SETTINGS
@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_merge_upsert_model(spark, target, source):
    # unique keys per side (merge contract); guard = ver
    t = {k: (k, v, x) for k, v, x in target}
    s = {k: (k, v, x) for k, v, x in source}
    tdf = spark.createDataFrame(list(t.values()), "k long, ver long, x long")
    sdf = spark.createDataFrame(list(s.values()), "k long, ver long, x long")
    out = {
        r.k: (r.ver, r.x)
        for r in _merge_dataframes(tdf, sdf, ["k"], "ver").collect()
    }
    model = {k: (v, x) for k, (_, v, x) in t.items()}
    for k, (_, v, x) in s.items():
        if k not in model or v > model[k][0]:
            model[k] = (v, x)
    assert out == model


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=15),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 9)),
        min_size=0,
        max_size=15,
    ),
)
@SETTINGS
def test_asof_join_model(spark, lefts, rights):
    # dedupe right on (k, t): keep max payload (matches operator tie-break:
    # among equal (ts, side), last over rval-asc order = max rval)
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(rights, "k long, rt long, v long") if rights else (
        spark.createDataFrame([], "k long, rt long, v long")
    )
    got = {
        r.lid: r.asof_v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="rt", value_col="v", alias="asof_v"
        ).collect()
    }
    model = {}
    for i, (k, t) in enumerate(lefts):
        best = None  # (rt, v)
        for rk, rt, v in rights:
            if rk == k and rt <= t and (best is None or (rt, v) > best):
                best = (rt, v)
        model[i] = best[1] if best else None
    assert got == model


# ---------------------------------------------------------------- lifecycle

_BATCH = st.dictionaries(
    st.integers(0, 3),  # key
    st.tuples(st.integers(0, 9), st.integers(0, 99)),  # (ver, payload)
    min_size=1,
    max_size=4,
)

_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "append",
                "upsert",
                "insert_only",
                "compact",
                "vacuum",
                "delete",
                "delete_mor",
                "update",
                "restore_prev",
            ]
        ),
        _BATCH,
    ),
    min_size=1,
    max_size=5,
)


@given(first=_BATCH, ops=_OPS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_table_lifecycle_model(spark, tmp_path, first, ops):
    """Random op chains (append / guarded upsert / insert-only merge /
    compact / vacuum / delete / update / restore) match a naive Python
    list-of-rows model — content preserved across the full transaction
    lifecycle including copy-on-write DML."""
    import uuid as _uuid

    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    def df_of(batch):
        return spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in sorted(batch.items())],
            "k long, ver long, x long",
        )

    t = LakeTable(spark, str(tmp_path / _uuid.uuid4().hex))
    t.overwrite(df_of(first))
    model = [(k, v[0], v[1]) for k, v in sorted(first.items())]

    for op, batch in ops:
        if op == "append":
            t.append(df_of(batch))
            model += [(k, v[0], v[1]) for k, v in sorted(batch.items())]
        elif op == "upsert":
            t.merge_upsert(df_of(batch), keys="k", guard_col="ver")
            new_model = []
            for k, ver, x in model:
                if k in batch and batch[k][0] > ver:
                    new_model.append((k, batch[k][0], batch[k][1]))
                else:
                    new_model.append((k, ver, x))
            present = {r[0] for r in model}
            for k, v in sorted(batch.items()):
                if k not in present:
                    new_model.append((k, v[0], v[1]))
            model = new_model
        elif op == "insert_only":
            t.merge_insert_only(df_of(batch), keys="k")
            present = {r[0] for r in model}
            model += [
                (k, v[0], v[1]) for k, v in sorted(batch.items()) if k not in present
            ]
        elif op == "compact":
            t.compact()
        elif op == "vacuum":
            t.vacuum(keep_last_n=1)
        elif op in ("delete", "delete_mor"):
            # delete keys present in the batch (DML predicate from data);
            # the mor variant must be observationally identical
            ks = sorted(batch)
            t.delete(
                F.col("k").isin(ks),
                mode="mor" if op == "delete_mor" else "cow",
            )
            model = [r for r in model if r[0] not in set(ks)]
            if not model:
                # an empty table has no snapshot to read; reseed
                t.append(df_of(first))
                model = [(k, v[0], v[1]) for k, v in sorted(first.items())]
        elif op == "update":
            ks = sorted(batch)
            ver0 = min(v[0] for v in batch.values())
            t.update(F.col("k").isin(ks), {"ver": F.lit(ver0)})
            model = [
                (k, ver0 if k in set(ks) else ver, x) for k, ver, x in model
            ]
        elif op == "restore_prev":
            v = t.latest_version()
            pre = sorted((r.k, r.ver, r.x) for r in t.read(version=v).collect())
            t.restore(v)  # restore to current = content no-op, new commit
            assert t.latest_version() == v + 1
            model_now = sorted(model)
            assert pre == model_now

    got = sorted((r.k, r.ver, r.x) for r in t.read().collect())
    assert got == sorted(model)


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=15),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 9)),
        min_size=0,
        max_size=15,
    ),
)
@SETTINGS
@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_asof_join_forward_model(spark, lefts, rights):
    """Forward direction: nearest right row at-or-after; value ties at
    identical timestamps resolve to the MIN value (desc scan, rval
    desc-order => last seen = min)."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(rights, "k long, rt long, v long") if rights else (
        spark.createDataFrame([], "k long, rt long, v long")
    )
    got = {
        r.lid: r.asof_v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="rt", value_col="v",
            alias="asof_v", direction="forward",
        ).collect()
    }
    model = {}
    for i, (k, t) in enumerate(lefts):
        best = None  # (rt, v): smallest rt >= t, then smallest v
        for rk, rt, v in rights:
            if rk == k and rt >= t and (best is None or (rt, v) < best):
                best = (rt, v)
        model[i] = best[1] if best else None
    assert got == model


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_pixel_codec_roundtrip_property(w: int, h: int, seed: int) -> None:
    """PNG and BMP codecs round-trip ANY raster (random dims + pixels):
    encode→decode is the identity, covering every PNG filter type (rows
    cycle through all five) and BMP stride padding at every width."""
    import random

    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        decode_bmp_rgb,
        decode_png_rgb,
        encode_bmp_rgb,
        encode_png_rgb,
    )

    rng = random.Random(seed)
    px = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(w)]
        for _ in range(h)
    ]
    assert decode_png_rgb(encode_png_rgb(px)) == px
    assert decode_bmp_rgb(encode_bmp_rgb(px)) == px


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ncolors=st.integers(min_value=1, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_codec_roundtrip_property(
    w: int, h: int, ncolors: int, interlace: bool, seed: int
) -> None:
    """GIF LZW codec round-trips ANY paletted raster (random dims,
    palette sizes from 1 to the full 256, both interlaced and
    sequential row order): encode→decode is the identity, covering
    variable code widths, the KwKwK case, and every GCT size field."""
    import random

    from real_time_e_commerce_analytics_lakehouse_spark.operators.multimodal import (
        decode_gif_rgb,
        encode_gif_rgb,
    )

    rng = random.Random(seed)
    pal = list(
        dict.fromkeys(
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(ncolors)
        )
    )
    px = [[pal[rng.randrange(len(pal))] for _ in range(w)] for _ in range(h)]
    assert decode_gif_rgb(encode_gif_rgb(px, interlace=interlace)) == px


# --------------------------------------------------------------------------
# bounded_frames: carry-partitioned frames == global windows on random
# sparse day sets (negative days, duplicates-free, gaps of any width)
# --------------------------------------------------------------------------

DAY_SETS = st.lists(
    st.integers(-25, 60), min_size=1, max_size=20, unique=True
)


@given(days=DAY_SETS, lookback=st.integers(0, 7))
@SETTINGS
def test_carried_range_window_model(spark, days, lookback):
    from decimal import Decimal

    from pyspark.sql import Window as W

    from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
        BUCKET,
        CARRIED,
        carried_range_buckets,
    )

    df = spark.createDataFrame(
        [(d, Decimal((d * 7) % 13)) for d in days], "day int, v decimal(18,2)"
    )
    aug = carried_range_buckets(df, "day", lookback, bucket_days=8)
    wp = W.partitionBy(BUCKET).orderBy("day").rangeBetween(-lookback, 0)
    got = sorted(
        (r["day"], r["s"])
        for r in aug.withColumn("s", F.sum("v").over(wp))
        .where(~F.col(CARRIED))
        .select("day", "s")
        .collect()
    )
    # naive python model of the global trailing range frame
    vals = {d: Decimal((d * 7) % 13) for d in days}
    want = sorted(
        (d, sum(v for dd, v in vals.items() if d - lookback <= dd <= d))
        for d in days
    )
    assert got == want


@given(days=DAY_SETS, k=st.integers(1, 4))
@SETTINGS
@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_carried_rows_window_model(spark, days, k):
    from decimal import Decimal

    from pyspark.sql import Window as W

    from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
        BUCKET,
        CARRIED,
        carried_rows_buckets,
    )

    df = spark.createDataFrame(
        [(d, Decimal((d * 5) % 11)) for d in days], "day int, v decimal(18,2)"
    )
    aug = carried_rows_buckets(df, "day", k_back=k, bucket_rows=5)
    wp = W.partitionBy(BUCKET).orderBy("day").rowsBetween(-k, 0)
    got = sorted(
        (r["day"], r["s"])
        for r in aug.withColumn("s", F.sum("v").over(wp))
        .where(~F.col(CARRIED))
        .select("day", "s")
        .collect()
    )
    for dep in getattr(aug, "_cached_deps", []):
        dep.unpersist()
    ordered = sorted(days)
    vals = [Decimal((d * 5) % 11) for d in ordered]
    want = sorted(
        (d, sum(vals[max(0, i - k): i + 1]))
        for i, d in enumerate(ordered)
    )
    assert got == want

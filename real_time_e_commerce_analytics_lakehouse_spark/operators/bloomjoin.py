"""Bloom-filter semi-join pruning: cut a fact table's shuffle volume
with a compact membership filter built from the (small) build side —
the runtime-filter / sideways-information-passing trick every
warehouse engine plays at scale (Spark's own runtime bloom filter,
`spark.sql.optimizer.runtime.bloomFilter.enabled`, does this inside
the optimizer; this operator is the explicit, plannable form, useful
when the build side is the OUTPUT of earlier engine stages the
optimizer cannot see through, e.g. a LakeTable read or a curated
dim).

Mechanics: the build side's join keys are hashed k ways into an m-bit
bitmap (one bounded aggregate job — the collect is <= m distinct bit
positions, independent of build-side row count); the bitmap embeds in
the probe-side plan as a hex-string literal and each probe row checks
its k bits with pure JVM expressions (xxhash64 / conv / bit-and — no
Python, no UDF). False positives are removed by the real join that
follows, so `bloom_join` is EXACTLY a plain join, just cheaper: only
probably-matching fact rows enter the shuffle.

Correctness contract: a Bloom filter has no false negatives, so
pruned-then-joined == joined. The gate query's oracle is therefore the
plain SQL join — the bloom never changes the answer, only the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _positions(key: str, i: int, bits: int) -> str:
    # hash the key through a COMMON representation: xxhash64 is
    # type-sensitive (hash(5 as int) != hash(5 as bigint)), so a
    # build/probe key type mismatch — which a plain join tolerates by
    # widening — would otherwise produce FALSE NEGATIVES and silently
    # drop matching rows (r5 review). String form is value-stable
    # across the integer widths and exact for all key types used here.
    return f"pmod(xxhash64(cast({key} as string), {i}), {bits})"


def bloom_build(df: DataFrame, key: str, bits: int, hashes: int) -> str:
    """Aggregate the build side into an m-bit bitmap, returned as a hex
    string (4 bits per char, bit p at char p div 4, mask 1<<(p mod 4)).
    One Spark job; the collect is bounded by m/4 distinct positions."""
    pos = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.expr(_positions(key, i, bits))
                        for i in range(hashes)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    nibbles = bytearray(bits // 4)
    for r in pos:
        nibbles[r.p // 4] |= 1 << (r.p % 4)
    return "".join(_HEX[n] for n in nibbles)


def bloom_might_contain(
    bitmap_hex: str, key: str, bits: int, hashes: int
) -> Column:
    """JVM-only membership predicate against the hex bitmap literal:
    all k bits of the key's hash positions must be set."""
    conds = []
    for i in range(hashes):
        p = _positions(key, i, bits)
        nib = (
            f"cast(conv(substring('{bitmap_hex}', "
            f"cast(({p}) div 4 as int) + 1, 1), 16, 10) as int)"
        )
        conds.append(
            f"(({nib} & shiftleft(1, cast(({p}) % 4 as int))) > 0)"
        )
    return F.expr(" AND ".join(conds))


def _auto_bits(n_keys: int) -> int:
    """~16 bits/key (k=3 -> ~0.6% false positives), power of two in
    [8192, 2^20]. At 2^20 the plan literal is 256 KB — past that the
    build side is no longer 'small' and a plain shuffle join is the
    right plan anyway."""
    bits = 8192
    while bits < 16 * max(n_keys, 1) and bits < (1 << 20):
        bits <<= 1
    return bits


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    bits: int | None = None,
    hashes: int = 3,
) -> DataFrame:
    """Filter `probe` to rows whose key is probably in `build`'s key
    set. No false negatives; ~0.6% false positives at default sizing.
    Two jobs total: the bounded bitmap aggregate, then the probe scan
    with the filter folded in (pushdown-friendly: the predicate is
    deterministic scalar expressions over one column)."""
    if bits is None:
        # sized from a cheap approximate cardinality folded into ONE
        # aggregate pass alongside nothing else the probe needs — the
        # old exact distinct().count() was a full extra shuffle job
        # over the build side (r5 review); the bloom only needs the
        # ORDER of magnitude (sizing rounds to powers of two anyway)
        n = build.agg(
            F.approx_count_distinct(build_key).alias("n")
        ).first()["n"]
        bits = _auto_bits(int(n))
    if bits <= 0 or bits % 4:
        raise ValueError(f"bits must be a positive multiple of 4, got {bits}")
    bitmap = bloom_build(build, build_key, bits, hashes)
    return probe.filter(
        bloom_might_contain(bitmap, probe_key, bits, hashes)
    )


def bloom_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    bits: int | None = None,
    hashes: int = 3,
) -> DataFrame:
    """Exactly `probe ⋈ build`, with the probe side bloom-pruned before
    the shuffle. The join removes the bloom's false positives, so the
    result is identical to the plain join — only the shuffled volume
    changes (at 100 TB: the fact rows that survive pruning)."""
    pruned = bloom_prune(probe, build, probe_key, build_key, bits, hashes)
    if probe_key == build_key:
        # name-based join coalesces the shared key column — the
        # expression join would keep two identically-named columns and
        # break every downstream reference (r5 review), diverging from
        # the plain join this function must equal
        return pruned.join(build, on=probe_key, how="inner")
    return pruned.join(
        build, pruned[probe_key] == build[build_key], "inner"
    )

"""Text-analysis SQL expression builders, generated per dialect.

``dialect`` is "spark" (Spark SQL, used via F.expr so everything stays
JVM-side / codegen'd — no Python UDFs in the text hot path) or "duck"
(DuckDB, for the differential oracle). The two dialects differ in:

- regex split:   split(x, '\\\\s+')        vs regexp_split_to_array(x, '\\s+')
- lambdas:       filter/transform         vs list_filter/list_transform
- array min:     array_min                vs list_aggregate(:, 'min')
- array index:   element_at(a, i) 1-based vs a[i] 1-based
- int sequence:  sequence(a, b)           vs generate_series(a, b)
- array length:  size                     vs len
- concat:        concat(a, b)             vs a || b

Semantics are pinned identical; tests/test_llm_ops.py, tests/
test_plans.py, and the driver gate enforce it.
"""

from __future__ import annotations

# Per-language stopword seeds for the language-ID heuristic (public
# common-word lists, truncated; the heuristic is count-of-hits).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "les", "et", "un", "une", "est", "dans", "pour", "que", "du"),
    "es": ("el", "los", "y", "un", "una", "es", "en", "para", "por", "las"),
}

PUNCT_CLASS = "[.,!?;:]"
# BPE-ish word/punct tokenizer (RE2- and Java-regex compatible)
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"


def tokens(col: str, dialect: str) -> str:
    """Whitespace tokens of lower(trim(col))."""
    if dialect == "spark":
        return f"split(trim(lower({col})), '\\\\s+')"
    return f"regexp_split_to_array(trim(lower({col})), '\\s+')"


def norm_text(col: str, dialect: str) -> str:
    """Whitespace-collapsed lower(trim(col)) — dedup normalization."""
    if dialect == "spark":
        return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')"
    return f"regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"


def fingerprint(col: str, dialect: str) -> str:
    """Deterministic document fingerprint = md5 of normalized text."""
    return f"md5({norm_text(col, dialect)})"


def n_array(arr: str, dialect: str) -> str:
    return f"size({arr})" if dialect == "spark" else f"len({arr})"


def count_in_set(arr: str, values: tuple[str, ...], dialect: str) -> str:
    """Number of array elements contained in a literal set."""
    lit = ", ".join(f"'{v}'" for v in values)
    if dialect == "spark":
        return f"size(filter({arr}, x -> x in ({lit})))"
    return f"len(list_filter({arr}, x -> x in ({lit})))"


def punct_count(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', ''))"
    return f"length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', '', 'g'))"


def bpe_token_count(col: str, dialect: str) -> str:
    """Token count under a BPE-ish word/punctuation regex."""
    if dialect == "spark":
        return f"size(regexp_extract_all(lower({col}), '{BPE_TOKEN_RE}', 0))"
    return f"len(regexp_extract_all(lower({col}), '{BPE_TOKEN_RE}'))"


def shingles(tokens_expr: str, n: int, dialect: str) -> str:
    """Word n-gram shingles from a token array (space-joined)."""
    if dialect == "spark":
        parts = ", ".join(f"element_at({tokens_expr}, i + {k})" for k in range(n))
        return (
            f"case when size({tokens_expr}) >= {n} then "
            f"transform(sequence(1, size({tokens_expr}) - {n - 1}), "
            f"i -> concat_ws(' ', {parts})) "
            f"else array() end"
        )
    body = " || ' ' || ".join(f"{tokens_expr}[i + {k}]" for k in range(n))
    return (
        f"case when len({tokens_expr}) >= {n} then "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
        f"i -> {body}) "
        f"else [] end"
    )


def dup_frac(arr: str, dialect: str) -> str:
    """Fraction of duplicate elements in a pre-projected array column —
    the Gopher/Dolma-style repetition signal (1 - distinct/total; 0 for
    empty arrays). Row-local; integer sizes divide identically in both
    engines (IEEE double division of the same ints)."""
    if dialect == "spark":
        # filter NULL elements before the distinct (r5 review): DuckDB's
        # list_distinct drops NULLs as well as duplicates while Spark's
        # array_distinct keeps one — [NULL, NULL] scored 0.5 vs 1.0.
        # Current callers build NULL-free arrays, but the pin must hold
        # by construction, not by luck.
        distinct = f"size(array_distinct(filter({arr}, x -> x is not null)))"
        return (
            f"case when size({arr}) > 0 then "
            f"round(1.0 - cast({distinct} as double) / size({arr}), 6) "
            f"else cast(0.0 as double) end"
        )
    return (
        f"case when len({arr}) > 0 then "
        f"round(1.0 - cast(len(list_distinct({arr})) as double) / len({arr}), 6) "
        f"else cast(0.0 as double) end"
    )


def minhash(shingles_expr: str, seed: int, dialect: str) -> str:
    """One MinHash signature component: min over shingles of a seeded
    md5. md5 hex strings compare identically in both engines, so MIN of
    the string IS the signature — no integer conversion needed.

    NOTE: one md5 per (shingle, seed). For k-component signatures prefer
    the sliced-digest pair below (minhash_digests + minhash_component):
    2 md5 calls per shingle total instead of k — measured ~3x faster at
    k=8 with equivalent statistical behavior (each 8-hex slice of the
    double digest is an independent 32-bit hash)."""
    if dialect == "spark":
        return f"array_min(transform({shingles_expr}, s -> md5(concat('{seed}|', s))))"
    return (
        f"list_aggregate(list_transform({shingles_expr}, "
        f"s -> md5('{seed}|' || s)), 'min')"
    )


def minhash_digests(shingles_expr: str, dialect: str) -> str:
    """Per-shingle 64-hex-char combined digest (two seeded md5s) — the
    shared input for up to 8 sliced MinHash components."""
    if dialect == "spark":
        return (
            f"transform({shingles_expr}, "
            f"s -> concat(md5(concat('a|', s)), md5(concat('b|', s))))"
        )
    return (
        f"list_transform({shingles_expr}, "
        f"s -> md5('a|' || s) || md5('b|' || s))"
    )


def minhash_component(digests_expr: str, j: int, dialect: str) -> str:
    """j-th sliced MinHash component (j in 0..7): min over shingles of
    hex chars [8j+1, 8j+8] of the combined digest — an independent
    32-bit hash per slice."""
    pos = 8 * j + 1
    if dialect == "spark":
        return f"array_min(transform({digests_expr}, h -> substr(h, {pos}, 8)))"
    return (
        f"list_aggregate(list_transform({digests_expr}, "
        f"h -> substr(h, {pos}, 8)), 'min')"
    )


_HEX_ODD = "'1','3','5','7','9','b','d','f'"


def simhash_bitsum(tokens_expr: str, bit: int, dialect: str) -> str:
    """Sum over tokens of (2*bit-1) for bit position `bit` (0..15): the
    bit is the parity of the (bit+1)-th hex nibble of md5(token)."""
    pos = bit + 1
    if dialect == "spark":
        ones = (
            f"size(filter({tokens_expr}, "
            f"t -> substr(md5(t), {pos}, 1) in ({_HEX_ODD})))"
        )
        return f"({ones} * 2 - size({tokens_expr}))"
    ones = (
        f"len(list_filter({tokens_expr}, "
        f"t -> substr(md5(t), {pos}, 1) in ({_HEX_ODD})))"
    )
    return f"({ones} * 2 - len({tokens_expr}))"


def simhash(tokens_expr: str, bits: int, dialect: str) -> str:
    """SimHash value: for each bit position, majority vote of per-token
    bits (weight 1 per occurrence); assemble into an integer.

    Spark spelling hashes each token ONCE (r5 review): the per-bit
    spelling expanded to `bits` independent filter lambdas whose md5
    calls codegen cannot share — 16x the hashing on the fingerprint hot
    path, the exact cost minhash_digests documents eliminating. Here a
    first transform binds md5(token) per token, a second folds its
    nibble parities into a per-token bit PATTERN (one pass over the
    digest), and the per-bit votes then filter cheap integers. DuckDB
    keeps the direct per-bit spelling (the oracle runs once at tiny
    scale; values are identical by construction)."""
    if not 1 <= bits <= 32:
        raise ValueError(f"bits must be in [1, 32] (md5 has 32 nibbles), got {bits}")
    if dialect == "spark":
        odds = _HEX_ODD
        # per-token bit pattern: bit b set iff nibble b+1 of md5 is odd
        pattern = (
            f"transform(transform({tokens_expr}, t -> md5(t)), "
            f"h -> aggregate(sequence(0, {bits - 1}), 0L, "
            f"(acc, b) -> acc + if(substr(h, b + 1, 1) in ({odds}), "
            f"shiftleft(1L, b), 0L)))"
        )
        terms = [
            f"(case when size(filter(__sp, p -> (p div {1 << b}) % 2 = 1)) * 2 "
            f"> size(__sp) then {1 << b} else 0 end)"
            for b in range(bits)
        ]
        total = " + ".join(terms)
        # bind the pattern array once via a lambda scope (exists() would
        # short-circuit; aggregate over a 1-element wrapper keeps it a
        # plain scalar expression)
        return (
            f"aggregate(array({pattern}), cast(0 as bigint), "
            f"(z, __sp) -> cast({total} as bigint))"
        )
    terms = [
        f"(case when {simhash_bitsum(tokens_expr, b, dialect)} > 0 "
        f"then {1 << b} else 0 end)"
        for b in range(bits)
    ]
    total = " + ".join(terms)
    return f"cast({total} as bigint)"


def langid_case(tokens_expr: str, dialect: str) -> str:
    """Predicted language: argmax of stopword hits with a fixed
    tie-break order (en > de > fr > es)."""
    counts = {
        lang: count_in_set(tokens_expr, words, dialect)
        for lang, words in STOPWORDS.items()
    }
    # coalesce each count to 0 (r5 review): NULL tokens made every
    # comparison NULL, so the CASE fell through to 'es' — and under
    # legacy sizeOfNull Spark flipped to 'en' while DuckDB stayed 'es'.
    # With 0-counts a NULL document deterministically classifies as the
    # documented tie-break winner 'en' on both engines.
    c = {lang: f"coalesce(({expr}), 0)" for lang, expr in counts.items()}
    return (
        "case "
        f"when {c['en']} >= {c['de']} and {c['en']} >= {c['fr']} "
        f"and {c['en']} >= {c['es']} then 'en' "
        f"when {c['de']} >= {c['fr']} and {c['de']} >= {c['es']} then 'de' "
        f"when {c['fr']} >= {c['es']} then 'fr' "
        "else 'es' end"
    )


def hash_bucket(expr: str, buckets: int, dialect: str) -> str:
    """Deterministic [0, buckets) bucket from md5 of an expression — the
    cross-engine replacement for rand()-based sampling: same row, same
    bucket, forever (reproducible data mixing / splits). First 8 hex
    chars = an unbiased 32-bit slice of the digest."""
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substr(md5(cast({expr} as string)), 1, 8), 16, 10) "
            f"as bigint), {buckets})"
        )
    return f"(('0x' || substr(md5(cast({expr} as VARCHAR)), 1, 8))::BIGINT % {buckets})"


def hash_u32(expr: str, dialect: str) -> str:
    """Deterministic 32-bit uniform from md5 of an expression (the raw
    slice behind hash_bucket): an integer u in [0, 2^32) usable as a
    cross-engine pseudo-random draw in INTEGER comparisons — float
    transforms (pow/log) of u can differ between libm builds in the
    last ulp, integer predicates cannot."""
    if dialect == "spark":
        return (
            f"cast(conv(substr(md5(cast({expr} as string)), 1, 8), 16, 10) "
            f"as bigint)"
        )
    return f"(('0x' || substr(md5(cast({expr} as VARCHAR)), 1, 8))::BIGINT)"


def redact(col: str, dialect: str) -> str:
    """PII-style scrubbing: emails then 4+ digit runs, masked with typed
    placeholders. Patterns kept in the RE2 ∩ Java-regex subset so both
    engines rewrite identically."""
    email = "[a-z0-9._%+-]+@[a-z0-9.-]+"
    digits = "[0-9]{4,}"
    if dialect == "spark":
        inner = f"regexp_replace(lower({col}), '{email}', '<EMAIL>')"
        return f"regexp_replace({inner}, '{digits}', '<NUM>')"
    inner = f"regexp_replace(lower({col}), '{email}', '<EMAIL>', 'g')"
    return f"regexp_replace({inner}, '{digits}', '<NUM>', 'g')"

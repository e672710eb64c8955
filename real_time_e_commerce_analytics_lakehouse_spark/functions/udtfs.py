"""Python user-defined table functions (Spark 4 UDTF API).

The engine's production chunker is the JVM expression pipeline in
``plans/documents.chunk_documents_sliding`` (tokenize -> sequence ->
explode -> slice: whole-stage codegen, zero Python). This module carries
the UDTF spelling of the same operator — the shape to reach for when
per-row expansion logic genuinely needs Python (a tokenizer library, a
parser) and a LATERAL-joinable table function is the natural interface:

    spark.udtf.register("chunk_tokens", chunk_tokens_udtf)
    spark.sql("SELECT d.doc_id, c.* FROM documents d,
               LATERAL chunk_tokens(d.text, 40, 20) c")

Equivalence with the JVM pipeline is pinned in
``tests/test_llm_ops.py::test_chunk_udtf_matches_jvm_chunker`` so the
two spellings cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType=(
    "chunk_index bigint, token_start bigint, chunk_tokens bigint, "
    "chunk_text string"
))
class chunk_tokens_udtf:
    """Sliding-window token chunks of one text value: `window`-token
    chunks every `stride` tokens, 1-based token_start, short tail chunks
    kept, empty/NULL text producing one empty chunk (the same contract
    as chunk_documents_sliding)."""

    def eval(self, text: str, window: int, stride: int):
        toks = (text or "").strip().lower().split()
        n = len(toks)
        for i, s in enumerate(range(0, max(n, 1), stride)):
            piece = toks[s : s + window]
            yield i, s + 1, len(piece), " ".join(piece)


def geometric_mean_udaf():
    """Vectorized user-defined AGGREGATE (pandas_udf GROUPED_AGG): the
    geometric mean, which has no single built-in aggregate. Arrow ships
    each group's column as one pandas Series — a numpy reduction, not a
    per-row Python call. Equivalence with the JVM spelling
    exp(avg(ln(x))) is pinned in tests; the JVM expression remains the
    production path (this demonstrates the escape hatch for aggregates
    with no expression form)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import
    # annotations` stringifies the type hints this module-wide, which
    # defeats pandas_udf's signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return geo_mean

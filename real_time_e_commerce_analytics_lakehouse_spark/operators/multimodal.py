"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats images/audio/video as `binary` columns with metadata
structs, processed by Arrow-batched pandas kernels over mapInPandas —
the only Python in the engine's hot paths, and the standard shape for
decode/resize/frame-sample at 100 TB (per-partition batch iterators, no
per-row serde, no driver involvement).

Decode kernels for real media need image/audio libraries that are not in
this container; they are stubbed behind NotImplementedError with the
Spark-side plumbing (schema, batch iteration, partitioning) real and
tested. `extract_binary_features` is the fully-working reference kernel
(byte length + md5) used by the differential gate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_binary_features(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Output: (id_col, n_bytes bigint, content_hash string). Deterministic,
    so it is oracle-verifiable (octet_length + md5 in SQL).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "content_hash": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    schema = f"{id_col} long, n_bytes long, content_hash string"
    return df.mapInPandas(kernel, schema=schema)


@dataclass
class ImageMeta:
    """Typed metadata accompanying an image payload column."""

    width: int
    height: int
    format: str  # e.g. "jpeg", "png"


IMAGE_FEATURE_SCHEMA = (
    "id long, width int, height int, n_channels int, mean_luma double"
)


def decode_images(df: DataFrame, id_col: str = "id", binary_col: str = "payload") -> DataFrame:
    """Decode image bytes -> (width, height, channels, mean luma).

    STUB: real decode needs an imaging library (Pillow/opencv), absent in
    this environment. The mapInPandas plumbing below is the production
    shape — swap `_decode_stub` for the real kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    **_decode_stub(pdf[binary_col]),
                }
            )

    return df.mapInPandas(kernel, schema=IMAGE_FEATURE_SCHEMA.replace("id ", f"{id_col} "))


def _decode_stub(payload: pd.Series) -> dict:
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; the mapInPandas plumbing (schema, batching, "
        "partition-parallelism) is exercised via "
        "deterministic_fake_decode in tests"
    )


def deterministic_fake_decode(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Test double for decode_images: derives fake-but-deterministic image
    properties from the payload bytes so the full pipeline (schema,
    batch shape, downstream aggregation) is testable without media libs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            b = pdf[binary_col]
            n = b.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "mean_luma": (n % 256).astype("float64"),
                }
            )

    return df.mapInPandas(kernel, schema=IMAGE_FEATURE_SCHEMA.replace("id ", f"{id_col} "))


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling STUB: at scale this is mapInPandas producing
    one row per sampled frame (explode in Python, Arrow out). Needs a
    video lib; kept as the documented extension point."""
    raise NotImplementedError("video decode libraries unavailable in this environment")

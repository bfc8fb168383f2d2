"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector so the Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partitioning — is real and tested end-to-end.

Scale design: binaries ride as parquet BinaryType (no base64 inflation);
feature extraction is `mapInPandas` (Arrow-batched, partition-local, no
shuffle); metadata predicates (media_type, byte_len) push down to the
scan before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("byte_len", T.IntegerType()),
    ]
)


def to_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata —
    the shape a real image/audio ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).alias("byte_len"),
    )


def decode_stub(payload: bytes, fake: bool) -> list[float]:
    """The decode step a real deployment replaces with PIL/ffmpeg.
    Deterministic fake: k-th byte-sum mod small primes → FEATURE_DIM
    floats."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    primes = [251, 241, 239, 233, 229, 227, 223, 211]
    total = sum(payload)
    return [float(total % p) / p for p in primes[:FEATURE_DIM]]


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (`mapInPandas`): partition-local, schema-stable, pushdown-friendly
    (filter on media_type/byte_len BEFORE this runs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "features": pdf["payload"].map(
                        lambda p: decode_stub(bytes(p), fake)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)

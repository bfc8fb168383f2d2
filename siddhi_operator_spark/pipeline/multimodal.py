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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, fake: bool) -> bytes:
    """Image resize — a real deployment swaps in PIL. Deterministic
    fake: truncate/cycle the payload to w·h bytes so output size is a
    real function of the target dimensions."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL, not present in this container; "
            "pass fake=True for the deterministic stub"
        )
    n = w * h
    reps = (n // max(len(payload), 1)) + 1
    return (payload * reps)[:n]


def resize(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize images to width×height (`mapInPandas`, Arrow-batched).
    Non-image rows pass through untouched — the media_type predicate is
    evaluated JVM-side by the preceding filter/when, Python only sees
    the rows it must transform."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"].str.startswith("image/")
            out = pdf.copy()
            out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(
                lambda p: resize_stub(bytes(p), width, height, fake)
            )
            out["byte_len"] = out["payload"].map(len).astype("int32")
            out["width"] = pd.Series([width] * len(out)).where(is_img, other=-1)
            out["height"] = pd.Series([height] * len(out)).where(is_img, other=-1)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out[["doc_id", "media_type", "payload", "byte_len", "width", "height"]]

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(
    media: DataFrame, n_frames: int, frame_bytes: int = 16, fake: bool = True
) -> DataFrame:
    """Sample n frames per video (1→N row expansion via `mapInPandas` —
    the UDTF shape of SURVEY.md §3.11). Deterministic fake: the k-th
    frame is the k-th stride slice of the payload; a real deployment
    swaps in ffmpeg keyframe extraction. Filter media_type BEFORE this
    runs so Python only sees videos."""
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg, not present in this container; "
            "pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                stride = max(len(b) // max(n_frames, 1), 1)
                for k in range(n_frames):
                    start = (k * stride) % max(len(b), 1)
                    rows.append((doc_id, k, b[start : start + frame_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(run, FRAMES_SCHEMA)


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

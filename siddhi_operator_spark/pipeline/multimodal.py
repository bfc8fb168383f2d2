"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

TWO decode tiers share the same `mapInPandas` interface:

- ``decoder="real"`` — actual pure-python decoding
  (``media_codecs``): full PNG scanline-filter reconstruction and
  RIFF/PCM WAV parsing with pixel/sample statistics; mp4 (no
  pure-python decoder exists) falls back to byte statistics. A
  production deployment swaps in PIL/ffmpeg behind the same dispatch.
- ``fake=True`` — the deterministic stub retained for plumbing tests
  and for payloads that are not real media files; ``decode_stub``
  raises NotImplementedError when neither tier applies.

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

from .media_codecs import decode_media, encode_png, encode_wav

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


def extract_features(
    media: DataFrame, fake: bool = True, decoder: str | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (`mapInPandas`): partition-local, schema-stable, pushdown-friendly
    (filter on media_type/byte_len BEFORE this runs).

    ``decoder="real"`` runs the pure-python PNG/WAV decoders
    (``media_codecs.decode_media``) — payloads must then be real files
    of their declared media_type; otherwise the deterministic stub
    (``fake``) applies."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                feats = [
                    decode_media(bytes(p), mt)
                    for p, mt in zip(pdf["payload"], pdf["media_type"])
                ]
            else:
                feats = [decode_stub(bytes(p), fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def synth_real_media(df_ids: DataFrame) -> DataFrame:
    """Deterministic REAL media per doc_id — actual PNG files (gradient
    pixels), actual PCM WAVs (sawtooth samples), and raw byte payloads
    for the mp4 slot, generated distributed via the pure-python
    encoders (no binary fixtures on disk, no driver materialization).
    Layout is closed-form in doc_id so decode results are
    oracle-checkable:

    - ``doc_id % 3 == 0`` → PNG, width ``8 + id%5``, height ``6 + id%3``,
      grayscale pixel (r,c) = ``(r*7 + c*13 + id) % 256``;
    - ``doc_id % 3 == 1`` → WAV, ``64 + id%32`` samples @ 8 kHz/16-bit,
      sample k = ``((k*37 + id*11) % 2048) - 1024``;
    - else → ``100 + id%50`` bytes, byte k = ``(k*31 + id) % 256``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:
                    w, h = 8 + d % 5, 6 + d % 3
                    px = bytes(
                        (r * 7 + c * 13 + d) % 256
                        for r in range(h)
                        for c in range(w)
                    )
                    rows.append((d, "image/png", encode_png(w, h, px)))
                elif d % 3 == 1:
                    n = 64 + d % 32
                    samples = [((k * 37 + d * 11) % 2048) - 1024 for k in range(n)]
                    rows.append((d, "audio/wav", encode_wav(samples)))
                else:
                    payload = bytes((k * 31 + d) % 256 for k in range(100 + d % 50))
                    rows.append((d, "video/mp4", payload))
            out = pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])
            out["byte_len"] = out["payload"].map(len).astype("int32")
            yield out[["doc_id", "media_type", "payload", "byte_len"]]

    return df_ids.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)

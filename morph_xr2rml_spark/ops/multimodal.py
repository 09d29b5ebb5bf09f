"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (this environment has no image/audio
codecs): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder runs so
the Spark-side plumbing — schema, batch shape, mapInPandas iteration,
partition sizing — is real and tested end-to-end. Swapping the fake for
Pillow/torchaudio is a one-function change inside the UDF body.

Schema conventions:
  payload   binary          raw bytes (opaque)
  media     struct<kind:string, format:string, width:int, height:int,
                   duration_ms:long>   typed metadata
  features  array<float>    extracted feature vector
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16


def attach_fake_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary payload + metadata from a text
    table — the test harness's stand-in for real media ingestion.
    Pure Column expressions (JVM-side)."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    nbytes = F.octet_length(payload)
    meta = F.struct(
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.lit("fake/raw").alias("format"),
        (nbytes % 640 + 1).cast("int").alias("width"),
        (nbytes % 480 + 1).cast("int").alias("height"),
        (nbytes.cast("long") * 10).alias("duration_ms"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media")
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic fake 'decoded pixels': byte histogram over 16 bins."""
    if buf is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = max(int(arr.size), 1)
    return (hist / total).astype(np.float32)


def decode_image(buf: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a pixel array. STUB: real codec
    (e.g. Pillow) is not available in this environment."""
    if fake:
        return _fake_decode(buf)
    raise NotImplementedError(
        "image decoding requires an image codec (Pillow); "
        "wire it in here — the Spark plumbing is codec-agnostic"
    )


def decode_audio(buf: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to samples. STUB, as decode_image."""
    if fake:
        return _fake_decode(buf)
    raise NotImplementedError("audio decoding requires an audio codec")


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
    batch_rows: int = 256,
) -> DataFrame:
    """payload -> feature vector via mapInPandas (Arrow batches).

    mapInPandas (not a scalar pandas_udf) because decode output size is
    row-dependent in real codecs and batches must be re-chunkable; the
    iterator form also lets one partition stream without materializing
    all decoded frames at once — the property that matters when a
    partition holds gigabytes of video.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    decode_image(buf, fake=fake).tolist()
                    for buf in chunk[payload_col]
                ]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].astype("int64"),
                        "features": feats,
                        "n_bytes": [
                            len(b) if b is not None else 0
                            for b in chunk[payload_col]
                        ],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    frame_bytes: int = 16,
) -> DataFrame:
    """'Video frame' sampling as deterministic byte slicing: one output
    row per sampled frame. Demonstrates the explode-shaped decode path
    (one input row -> N media rows) with native expressions."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(every_n_bytes)
    )
    return (
        df.select(
            F.col(id_col), F.col(payload_col), F.explode(offsets).alias("offset")
        )
        .select(
            id_col,
            "offset",
            F.substring(F.col(payload_col), F.col("offset") + 1, frame_bytes).alias(
                "frame"
            ),
        )
    )

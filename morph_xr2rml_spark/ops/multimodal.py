"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Decoding has a REAL pure-Python baseline for the two public formats
that need no codec library: Netpbm images (P5/P6 binary, P2/P3 ASCII —
``decode_ppm``) and RIFF/WAVE PCM audio (``decode_wav``, stdlib
``wave``). ``decode_image``/``decode_audio`` dispatch on the payload's
magic bytes; formats that genuinely need a codec (JPEG/PNG/MP3/...)
raise NotImplementedError with the wiring point named. ``fake=True``
keeps the deterministic raw-bytes pseudo-decode so the Spark-side
plumbing — schema, batch shape, mapInPandas iteration, partition
sizing — is testable on arbitrary payloads (and the historical
``multimodal_features`` oracle stays byte-identical).

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


# constant 44-byte RIFF/WAVE header for a 64-sample 16-bit mono 8 kHz
# PCM clip (128 data bytes) — all fields are fixed, so real WAV payloads
# synthesize with pure Column expressions (F.lit(bytes) + concat)
def _wav_header_64() -> bytes:
    import struct

    return (
        b"RIFF" + struct.pack("<I", 36 + 128) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 128)
    )


def attach_real_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL media payloads from a text table, built with
    pure Column expressions (JVM-side, no Python): even ids get an
    8x8 P6 pixmap whose 192 pixel bytes are ``repeat(md5(text), 6)``;
    odd ids a 64-sample 16-bit mono 8 kHz WAVE whose 128 data bytes are
    ``repeat(md5(text), 4)``. Both parse with the pure-Python decoders
    below, so the decode path is exercised end-to-end on synthetic-but-
    well-formed media."""
    md5 = F.md5(F.col(text_col).cast("string"))
    img = F.concat(
        F.encode(F.lit("P6\n8 8\n255\n"), "UTF-8"),
        F.encode(F.repeat(md5, 6), "UTF-8"),
    )
    wav = F.concat(
        F.lit(_wav_header_64()), F.encode(F.repeat(md5, 4), "UTF-8")
    )
    is_img = F.col(id_col) % 2 == 0
    meta = F.struct(
        F.when(is_img, "image").otherwise("audio").alias("kind"),
        F.when(is_img, "image/x-portable-pixmap")
        .otherwise("audio/wav")
        .alias("format"),
        F.when(is_img, 8).cast("int").alias("width"),
        F.when(is_img, 8).cast("int").alias("height"),
        F.when(~is_img, 8).cast("long").alias("duration_ms"),
    )
    return df.select(
        F.col(id_col),
        F.when(is_img, img).otherwise(wav).alias("payload"),
        meta.alias("media"),
    )


def _featurize(arr: np.ndarray) -> np.ndarray:
    """Fixed-dimension feature vector from a decoded array: a
    normalized 16-bin histogram over the value range of the media kind
    (uint8 pixels -> [0,256); float samples -> [-1,1])."""
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rng = (0, 256) if arr.dtype == np.uint8 else (-1.0, 1.0)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=rng)
    return (hist / max(int(arr.size), 1)).astype(np.float32)


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic pseudo-decode: the raw payload bytes as 'pixels'.
    Featurizing this reproduces the historical fake feature vector (a
    byte histogram over 16 bins) exactly."""
    if buf is None:
        return np.zeros(0, dtype=np.uint8)
    return np.frombuffer(buf, dtype=np.uint8)


_PPM_MAGICS = (b"P2", b"P3", b"P5", b"P6")


def decode_ppm(buf: bytes) -> np.ndarray:
    """Pure-Python Netpbm decoder (public spec, netpbm.sourceforge.net):
    P5/P6 binary and P2/P3 ASCII grayscale/RGB. Returns uint8 pixels of
    shape (h, w) for graymaps or (h, w, 3) for pixmaps. maxval must be
    <= 255 (the 2-byte-per-sample variant is out of scope for the
    baseline)."""
    if buf is None or buf[:2] not in _PPM_MAGICS:
        raise ValueError("not a supported Netpbm payload")
    magic = buf[:2].decode("ascii")
    # header tokens: magic, width, height, maxval — separated by
    # whitespace, with '#' comments running to end-of-line
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    width, height, maxval = tokens
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported Netpbm maxval {maxval}")
    channels = 3 if magic in ("P3", "P6") else 1
    n = width * height * channels
    if magic in ("P5", "P6"):
        pos += 1  # exactly ONE whitespace byte after maxval (spec)
        data = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    else:
        data = np.array(buf[pos:].split()[:n], dtype=np.uint8)
    if data.size != n:
        raise ValueError("truncated Netpbm payload")
    shape = (height, width, 3) if channels == 3 else (height, width)
    return data.reshape(shape)


def decode_wav(buf: bytes) -> np.ndarray:
    """Pure-stdlib RIFF/WAVE PCM decoder: frames via ``wave``, samples
    normalized to float32 in [-1, 1) (8-bit PCM is unsigned per spec,
    16/32-bit signed little-endian). Channels stay interleaved."""
    import io
    import wave

    with wave.open(io.BytesIO(buf)) as w:
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        return (
            (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0)
            / 128.0
        )
    if width == 2:
        return (
            np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
        )
    if width == 4:
        return (
            np.frombuffer(frames, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    raise NotImplementedError(f"unsupported PCM sample width {width}")


def _is_wav(buf: bytes) -> bool:
    return (
        buf is not None
        and len(buf) >= 12
        and buf[:4] == b"RIFF"
        and buf[8:12] == b"WAVE"
    )


def decode_image(buf: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a uint8 pixel array. Netpbm decodes
    natively (:func:`decode_ppm`); ``fake=True`` pseudo-decodes any
    payload as raw bytes; other formats need a codec (Pillow) — wire it
    in here, the Spark plumbing is codec-agnostic."""
    if fake:
        return _fake_decode(buf)
    if buf is not None and buf[:2] in _PPM_MAGICS:
        return decode_ppm(buf)
    raise NotImplementedError(
        "only Netpbm (P2/P3/P5/P6) decodes without a codec library; "
        "JPEG/PNG need Pillow wired in here"
    )


def decode_audio(buf: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to float32 samples in [-1, 1). WAVE/PCM
    decodes natively (:func:`decode_wav`); ``fake=True`` pseudo-decodes
    raw bytes; compressed formats need a codec."""
    if fake:
        return _fake_decode(buf)
    if _is_wav(buf):
        return decode_wav(buf)
    raise NotImplementedError(
        "only RIFF/WAVE PCM decodes without a codec library; "
        "MP3/OGG/FLAC need an audio codec wired in here"
    )


def decode_media(buf: bytes, fake: bool = False) -> np.ndarray:
    """Sniff the payload's magic and decode: Netpbm -> pixels,
    WAVE -> samples. ``fake=True`` always pseudo-decodes (no sniffing —
    deterministic regardless of payload content); unknown formats
    without ``fake`` raise."""
    if fake:
        return _fake_decode(buf)
    if buf is not None:
        if buf[:2] in _PPM_MAGICS:
            return decode_ppm(buf)
        if _is_wav(buf):
            return decode_wav(buf)
    raise NotImplementedError("unrecognized media payload (no codec)")


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
                    _featurize(decode_media(buf, fake=fake)).tolist()
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

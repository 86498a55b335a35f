"""Multimodal column convention + processing plumbing — [EXT]
(SURVEY.md §2.2 "multimodal columns").

Convention: a modality column is ``binary`` payload + a sibling typed struct
``<col>_meta`` (mime, width/height/duration, sha256...). Decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
over the binary column — the Spark-side plumbing (schema, batch shape,
partition sizing) is real and tested; the actual codec call is stubbed
because image/audio libraries are not in this container (marked clearly
below), with a deterministic fake for tests.

Scale notes: binary payloads dominate row size — repartition by size before
mapInPandas (``spark.sql.files.maxPartitionBytes`` governs scan-side), keep
``maxRecordsPerBatch`` low for multi-MB blobs, and push metadata-only
filters BEFORE the decode stage so the binary column is never read for
pruned rows (parquet column pruning does this for free if the filter uses
only metadata columns).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sha256", StringType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, payload_col: str = "payload", mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize a binary modality column from any column (test scaffolding:
    encodes the source as UTF-8 bytes) plus the typed metadata sibling."""
    payload = F.encode(F.col(source_col).cast("string"), "UTF-8")
    return df.withColumn(payload_col, payload).withColumn(
        payload_col + "_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def read_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Directory of media files -> (path, modificationTime, length, content)
    via the built-in binaryFile source; partition sizing handled by Spark."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _decode_image_real(payload: bytes) -> tuple[int, int]:
    # STUB: real implementation would be e.g. PIL.Image.open(io.BytesIO(...))
    # — image libraries are not available in this container.
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake=True (deterministic fake) for tests"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = True,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    The Arrow plumbing (schema in/out, batched iteration, column passthrough)
    is the real production shape; ``fake=True`` derives deterministic
    pseudo-features from the payload hash instead of decoding.
    """
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("img_width", IntegerType(), True),
            StructField("img_height", IntegerType(), True),
            StructField("img_sha256", StringType(), True),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, shas = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(raw).hexdigest()
                if fake:
                    # deterministic fake "decode": dimensions from the digest
                    widths.append(int(digest[:4], 16) % 4096)
                    heights.append(int(digest[4:8], 16) % 4096)
                else:
                    w, h = _decode_image_real(raw)
                    widths.append(w)
                    heights.append(h)
                shas.append(digest)
            pdf = pdf.copy()
            pdf["img_width"] = pd.array(widths, dtype="int32")
            pdf["img_height"] = pd.array(heights, dtype="int32")
            pdf["img_sha256"] = shas
            yield pdf

    return df.mapInPandas(process, schema=out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    target_width: int = 224,
    target_height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: payload in -> payload out with updated meta. Fake
    mode passes bytes through and stamps the target dimensions; a real
    implementation swaps the inner loop for PIL/opencv resize."""
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("resized_payload", BinaryType(), True),
            StructField("resized_width", IntegerType(), True),
            StructField("resized_height", IntegerType(), True),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an imaging library not present "
                    "in this environment"
                )
            pdf = pdf.copy()
            pdf["resized_payload"] = pdf[payload_col]
            pdf["resized_width"] = pd.array([target_width] * len(pdf), dtype="int32")
            pdf["resized_height"] = pd.array([target_height] * len(pdf), dtype="int32")
            yield pdf

    return df.mapInPandas(process, schema=out_schema)


AUDIO_FEATURE_DIM = 8


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction plumbing: payload -> fixed-dim float vector
    (the embedding-ready shape). Fake mode derives a deterministic
    pseudo-feature vector from the payload hash; a real implementation swaps
    in e.g. librosa MFCCs."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("audio_features", ArrayType(FloatType(), True), True)]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "audio decode requires an audio library not present "
                        "in this environment"
                    )
                digest = hashlib.sha256(raw).digest()
                feats.append(
                    [
                        int.from_bytes(digest[i * 2 : i * 2 + 2], "big") / 65535.0
                        for i in range(AUDIO_FEATURE_DIM)
                    ]
                )
            pdf = pdf.copy()
            pdf["audio_features"] = feats
            yield pdf

    return df.mapInPandas(process, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_nth: int = 10,
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one row in -> N frame rows
    out through mapInPandas (the row-explode shape a real decoder needs).
    Fake mode emits ``sha256(payload) % 3 + 1`` pseudo-frames."""
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("frame_index", IntegerType(), True),
            StructField("frame_payload", BinaryType(), True),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = bytes(row[payload_col]) if row[payload_col] is not None else b""
                if fake:
                    n_frames = (int(hashlib.sha256(raw).hexdigest()[:8], 16) % 3) + 1
                    for i in range(n_frames):
                        r = row.to_dict()
                        r["frame_index"] = i * every_nth
                        r["frame_payload"] = raw[:16]
                        rows.append(r)
                else:
                    raise NotImplementedError(
                        "video decode requires a codec library not present "
                        "in this environment"
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(process, schema=out_schema)

"""Multimodal column convention + processing plumbing — [EXT]
(SURVEY.md §2.2 "multimodal columns").

Convention: a modality column is ``binary`` payload + a sibling typed struct
``<col>_meta`` (mime, width/height/duration, sha256...). Decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
over the binary column.  Codec resolution is tiered: PIL / soundfile / PyAV
when importable (full coverage), else the pure-stdlib decoders in
``llmops.codecs`` (PNG/GIF/BMP/JPEG headers, full PNG pixel path, WAV PCM)
— REAL decodes with zero dependencies — and ``fake=True`` keeps the
deterministic hash-derived fakes for plumbing tests.  Only video has no
stdlib path (PyAV or fake).

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
    """REAL image dimension decode.  Prefers PIL when importable (full format
    coverage); otherwise falls back to the stdlib header parsers in
    ``llmops.codecs`` (PNG/GIF/BMP/JPEG — no external dependency).  Raises
    ValueError for formats neither path can read."""
    try:
        import io as _io

        from PIL import Image  # optional dep: full-codec path

        with Image.open(_io.BytesIO(payload)) as img:
            return img.width, img.height
    except ImportError:
        from kafka_connect_expand_json_transform_spark.llmops.codecs import (
            image_dimensions,
        )

        return image_dimensions(payload)


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
    """Resize: payload in -> payload out with updated meta.  ``fake=True``
    passes bytes through and stamps the target dimensions.  ``fake=False``
    REALLY resizes: PIL when importable (any format), else the stdlib PNG
    decode -> nearest-neighbor -> re-encode path in ``llmops.codecs``
    (8-bit non-interlaced PNG; other formats raise ValueError).  The stdlib
    unfilter loop is per-byte Python — fine for thumbnails and tests; ship
    PIL in production images for the vectorized path."""
    out_schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("resized_payload", BinaryType(), True),
            StructField("resized_width", IntegerType(), True),
            StructField("resized_height", IntegerType(), True),
        ]
    )

    def _resize_real(raw: bytes) -> bytes:
        try:
            import io as _io

            from PIL import Image

            with Image.open(_io.BytesIO(raw)) as img:
                buf = _io.BytesIO()
                img.resize((target_width, target_height)).save(buf, format=img.format or "PNG")
                return buf.getvalue()
        except ImportError:
            from kafka_connect_expand_json_transform_spark.llmops.codecs import (
                resize_png,
            )

            return resize_png(raw, target_width, target_height)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if fake:
                pdf["resized_payload"] = pdf[payload_col]
            else:
                pdf["resized_payload"] = [
                    _resize_real(bytes(p)) if p is not None else None
                    for p in pdf[payload_col]
                ]
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
    """Audio feature extraction: payload -> fixed-dim float vector (the
    embedding-ready shape).  ``fake=True`` derives a deterministic
    pseudo-feature vector from the payload hash.  ``fake=False`` REALLY
    decodes: soundfile/librosa when importable, else stdlib ``wave`` PCM
    parsing (``llmops.codecs.wav_features``) — duration, rate, channels,
    rms, peak, zero-crossing rate, DC mean, length, normalized into the
    same ``AUDIO_FEATURE_DIM``-wide vector."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField("audio_features", ArrayType(FloatType(), True), True)]
    )

    def _features_real(raw: bytes) -> list[float]:
        try:
            import io as _io

            import soundfile as sf  # optional dep: full-codec path

            data, rate = sf.read(_io.BytesIO(raw), always_2d=True)
            mono = data[:, 0]
            n = len(mono)
            zcr = float(((mono[:-1] >= 0) != (mono[1:] >= 0)).mean()) if n > 1 else 0.0
            return [
                n / rate if rate else 0.0,
                rate / 48000.0,
                float(data.shape[1]),
                float((mono**2).mean() ** 0.5) if n else 0.0,
                float(abs(mono).max()) if n else 0.0,
                zcr,
                float(mono.mean()) if n else 0.0,
                min(1.0, n / 1e6),
            ]
        except ImportError:
            from kafka_connect_expand_json_transform_spark.llmops.codecs import (
                wav_features,
            )

            f = wav_features(raw)
            return [
                f["duration_s"],
                f["rate"] / 48000.0,
                float(f["channels"]),
                f["rms"],
                f["peak"],
                f["zcr"],
                f["mean"],
                min(1.0, f["n_frames"] / 1e6),
            ]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if not fake:
                    feats.append([float(x) for x in _features_real(raw)])
                    continue
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
        from kafka_connect_expand_json_transform_spark.llmops import codecs

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
                elif codecs.sniff_mime(raw) == "video/x-msvideo":
                    # REAL stdlib path: MJPEG-in-AVI frames are complete
                    # JPEGs — container walking, no pixel codec needed
                    for i, jpeg in enumerate(codecs.avi_mjpeg_frames(raw)):
                        if i % every_nth:
                            continue
                        r = row.to_dict()
                        r["frame_index"] = i
                        r["frame_payload"] = jpeg
                        rows.append(r)
                else:
                    try:
                        import io as _io

                        import av  # optional dep: all non-MJPEG-AVI codecs
                    except ImportError as exc:
                        raise NotImplementedError(
                            "video decode beyond MJPEG/AVI requires PyAV "
                            "(no stdlib codec exists); install 'av' or use "
                            "fake=True"
                        ) from exc
                    with av.open(_io.BytesIO(raw)) as container:
                        for i, frame in enumerate(container.decode(video=0)):
                            if i % every_nth:
                                continue
                            r = row.to_dict()
                            r["frame_index"] = i
                            r["frame_payload"] = bytes(
                                frame.to_image().tobytes()[:1024]
                            )
                            rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(process, schema=out_schema)

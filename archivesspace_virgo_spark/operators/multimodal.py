"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with
a typed metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` operators so the Spark-side contract (schema, partitioning,
batch shape) is real and tested even though the actual media libs are not in
this container — the decode kernels are STUBBED behind
``MEDIA_DECODE_AVAILABLE`` with a deterministic fake used in tests.

Schema contract:

    media: STRUCT<payload BINARY, mime STRING, width INT, height INT,
                  duration_ms INT>

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (column pruning drops it unless a stage touches bytes), partition by
content type, and size ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_DECODE_AVAILABLE = False  # no PIL/ffmpeg in this container
try:  # pragma: no cover - environment-dependent
    import PIL.Image  # noqa: F401

    MEDIA_DECODE_AVAILABLE = True
except ImportError:
    pass

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media column (payload = utf-8 of text; metadata
    derived from lengths) — stands in for real blobs in tests/benches."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("payload"),
            F.lit("application/x-fake").alias("mime"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _decode_and_embed(payload: bytes, dim: int) -> np.ndarray:
    """STUB decode+embed kernel.

    Real implementation would decode the image/audio (PIL/ffmpeg) and run a
    feature extractor; neither lib ships in this container.  The stub is a
    deterministic byte-histogram feature so the full distributed plumbing
    (Arrow batches, schema, partition mapping) is exercised honestly.
    """
    if MEDIA_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real decode path not wired in this build")
    h = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(h % dim, minlength=dim).astype(np.float32)
    n = float(np.linalg.norm(hist)) or 1.0
    return hist / n


def extract_media_features(df: DataFrame, id_col: str = "doc_id", dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over the media struct.

    Batch shape: iterator of pandas DataFrames (Arrow); output one row per
    input row with payload hash + feature vector.  Payload bytes never cross
    a shuffle — the operator is map-side only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"].map(lambda m: bytes(m["payload"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "mime": pdf["media"].map(lambda m: m["mime"]),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _decode_and_embed(b, dim).tolist()
                    ),
                }
            )

    cols = df.select(F.col(id_col), F.col("media"))
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp.

    Decode is stubbed (no ffmpeg) — raises at kernel level if ever executed
    against a real video mime; the plan shape (explode of a generated
    timestamp sequence, payload untouched until the map stage) is the real,
    tested contract.
    """
    n_frames = F.greatest(
        (F.coalesce(F.col("media.duration_ms"), F.lit(0)) / every_ms).cast("int"),
        F.lit(0),
    )
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), n_frames * every_ms, F.lit(every_ms))),
    )

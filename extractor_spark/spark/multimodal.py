"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed in Arrow batches.

Image/audio decoding libraries are not available in this container, so the
decode step is stubbed behind an import-try (``decode_image`` raises
``NotImplementedError`` without PIL) while everything Spark-side — schemas,
batch shapes, partitioning, the vectorized UDF signature, and a
deterministic fake feature extractor — is real and tested.  Swapping the
fake for a real decoder changes one function body, not the dataflow.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("content_type", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Magic-byte MIME sniffing — pure Catalyst expressions, no Python.
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav-or-avi"),  # RIFF container
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
]


def with_sniffed_mime(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side magic-byte sniff: hex prefix → CASE ladder (no UDF)."""
    prefix = F.upper(F.hex(F.expr(f"substring({payload_col}, 1, 8)")))
    expr = F.lit(None).cast("string")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic), F.lit(mime)).otherwise(expr)
    return df.withColumn("sniffed_mime", expr)


def decode_image(payload: bytes):
    """Decode an image payload.  Real implementation requires PIL, absent in
    this container — the plumbing around it is exercised with
    ``fake_features`` instead."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in sandbox
        raise NotImplementedError(
            "image decoding requires pillow; install it on the cluster image"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in feature extractor: sha256-seeded pseudo-
    embedding in [-1, 1).  Same signature/batch shape as a real model."""
    digest = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        chunk = digest[(2 * i) % 32 : (2 * i) % 32 + 2]
        out.append(int.from_bytes(chunk, "big") / 32768.0 - 1.0)
    return out


FEATURES_FIELD = T.StructField("features", T.ArrayType(T.FloatType()), True)


def feature_extract_stage(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas,
    bounded batches — the exact shape a GPU/model stage would use)."""
    out_schema = T.StructType(media.schema.fields + [FEATURES_FIELD])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_features(p, dim) if p is not None else None
                for p in pdf["payload"].tolist()
            ]
            out = pdf.copy()
            out["features"] = feats
            yield out

    return media.mapInPandas(run, schema=out_schema)


def payload_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats JVM-side: length + xxhash (no Python)."""
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.xxhash64("payload").alias("payload_hash"),
    )

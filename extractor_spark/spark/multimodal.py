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


def pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize (requires pillow, absent in this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in sandbox
        raise NotImplementedError(
            "image resize requires pillow; install it on the cluster image"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: keeps the magic bytes (so MIME sniffing still
    works downstream) and derives a size-tagged digest body."""
    digest = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    return payload[:8] + digest


def resize_stage(
    media: DataFrame, width: int, height: int, resizer=fake_resize
) -> DataFrame:
    """Arrow-batched image resize: payload → resized payload, meta updated
    to the new dimensions.  ``resizer`` is pluggable (``pil_resize`` on a
    cluster image with pillow; the deterministic fake here) — swapping it
    changes one function, not the dataflow."""
    out_schema = media.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                resizer(p, width, height) if p is not None else None
                for p in pdf["payload"].tolist()
            ]
            out["meta"] = [
                (
                    {**(m if isinstance(m, dict) else {}), "width": width, "height": height}
                    if p is not None
                    else m  # nothing was resized — leave meta untouched
                )
                for m, p in zip(pdf["meta"].tolist(), pdf["payload"].tolist())
            ]
            yield out

    return media.mapInPandas(run, schema=out_schema)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_frame_decoder(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for an ffmpeg keyframe sampler: n_frames
    equal byte slices (a real decoder returns n encoded frames — same list
    shape)."""
    if not payload:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(min(n_frames, len(payload)))]


def sample_frames_stage(
    media: DataFrame, n_frames: int = 4, decoder=fake_frame_decoder
) -> DataFrame:
    """Video frame sampling: one input row fans out to ≤ n_frames rows
    (media_id, frame_idx, frame).  The row explosion, output schema, and
    Arrow batching are the production dataflow; ``decoder`` is pluggable
    (ffmpeg/pyav on a real cluster image)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
                if p is None:
                    continue
                for i, frame in enumerate(decoder(p, n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def payload_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats JVM-side: length + xxhash (no Python)."""
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.xxhash64("payload").alias("payload_hash"),
    )


PDF_TEXT_FIELD = T.StructField("pdf_text", T.StringType(), True)


def pdf_text_stage(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """PDF → layout-ordered text over a binary column (Arrow-batched).

    Unlike the image/video stages this one is NOT a stub: engine/pdf.py is
    a real stdlib-only extractor (north_rule "PDF/layout parse"), so crawl
    archives carrying application/pdf payloads flow through the same
    mapInPandas dataflow as HTML.  Non-PDF / unparseable payloads yield
    null, never an exception — a poisoned document must not fail a 100 TB
    task."""
    from ..engine.pdf import is_pdf, pdf_to_text

    out_schema = T.StructType(media.schema.fields + [PDF_TEXT_FIELD])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for p in pdf[payload_col].tolist():
                if p is None or not is_pdf(bytes(p)):
                    texts.append(None)
                    continue
                try:
                    texts.append(pdf_to_text(bytes(p)))
                except Exception:
                    texts.append(None)
            out = pdf.copy()
            out["pdf_text"] = texts
            yield out

    return media.mapInPandas(run, schema=out_schema)

"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing is real — binary columns, explicit output
schemas, Arrow batch iteration, partition-parallel decode — while the
actual media decoding is STUBBED: the container has no image/audio
libraries, so ``decode_image_meta`` derives deterministic fake
dimensions from the content digest, and the resize/real-decode paths
raise ``NotImplementedError`` unless PIL/soundfile are importable
(import-try gated). Swap ``_fake_dims`` for a real decoder and
nothing else changes.

Scale: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch) so executor memory is
batch-bounded regardless of blob sizes; decode parallelism equals
input partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.partitioning import spread

try:  # real decoder, if ever available
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

IMAGE_META_SCHEMA = "doc_id long, n_bytes long, width int, height int, media_type string"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary, n_bytes long"


def attach_demo_binary(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Demo media table: utf-8 bytes of the text stand in for an
    encoded image blob (no binary corpus ships in the testdata)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_dims(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real header parse: dimensions
    derived from the md5 digest (engine-reproducible)."""
    hexd = hashlib.md5(content).hexdigest()
    h1 = int(hexd[:8], 16)
    h2 = int(hexd[8:16], 16)
    return (h1 % 1920) + 1, (h2 % 1080) + 1


def decode_image_meta(df: DataFrame, content_col: str = "content",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-image metadata via mapInPandas. With PIL present this would
    open the blob; here the stub path computes digest-derived dims."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_fake_dims(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[content_col].map(len).astype("int64"),
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
                "media_type": pdf.get("media_type", pd.Series(["unknown"] * len(pdf))),
            })

    return spread(df).mapInPandas(batches, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  content_col: str = "content",
                  id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling stub: split the blob into
    ``n_frames`` contiguous chunks (one row per frame). Real codecs
    would seek keyframes; the batch shape/schema is what matters."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob)
                step = max(1, (len(blob) + n_frames - 1) // n_frames)
                chunks = [blob[i:i + step] for i in range(0, len(blob), step)][:n_frames]
                for j, c in enumerate(chunks):
                    ids.append(did); idxs.append(j); frames.append(c)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": frames,
                "n_bytes": pd.Series([len(c) for c in frames], dtype="int64"),
            })

    return spread(df).mapInPandas(batches, FRAME_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content") -> DataFrame:
    """Real image resize — requires PIL, which this container lacks."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image resize needs PIL; install pillow in the deployment image")
    raise NotImplementedError("PIL path not exercised in this build")

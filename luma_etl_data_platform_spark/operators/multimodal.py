"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing is real — binary columns, explicit output
schemas, Arrow batch iteration, partition-parallel decode — and the
decode story splits by format class:

- **fixed-layout formats are REALLY decoded**: P6 PPM images
  (``decode_ppm_stats`` — header parse, pixel reshape, channel
  stats), raw grayscale bitmaps (``resize_raw_gray`` — true
  nearest-neighbor resample), byte-sample audio
  (``extract_audio_features``);
- **entropy-coded codecs (JPEG/PNG) stay PIL-gated**: the container
  has no image libraries, so ``resize_images`` raises
  ``NotImplementedError`` behind an import-try, and
  ``decode_image_meta`` derives deterministic digest dims for
  unknown blob formats. Swap ``_fake_dims`` for a PIL open and
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
    """Codec-format image resize — requires PIL to decode
    JPEG/PNG/etc., which this container lacks. For raw bitmaps use
    ``resize_raw_gray`` below (no codec needed, fully implemented)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image resize needs PIL; install pillow in the deployment image")
    raise NotImplementedError("PIL path not exercised in this build")


RESIZE_SCHEMA = ("doc_id long, out_w int, out_h int, "
                 "pixels binary, pixel_sum long")


def resize_raw_gray(df: DataFrame, src_w: int, src_h: int,
                    dst_w: int, dst_h: int,
                    content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """REAL nearest-neighbor resize over raw row-major grayscale
    bitmaps (one byte per pixel) — no codec library needed, so unlike
    ``resize_images`` this path is fully implemented: blobs are
    zero-padded/truncated to src_w×src_h, then sampled at
    ``src_index = floor(dst_index * src/dst)`` per axis (the textbook
    nearest-neighbor mapping), vectorized with numpy over Arrow
    batches. Emits the resized bitmap and its pixel sum (an exact
    integer checksum a SQL oracle can recompute byte-by-byte)."""
    import numpy as np

    rows_map = (np.arange(dst_h) * src_h // dst_h)
    cols_map = (np.arange(dst_w) * src_w // dst_w)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, pix, sums = [], [], []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                buf = np.zeros(src_w * src_h, dtype=np.uint8)
                raw = np.frombuffer(bytes(blob)[:src_w * src_h], dtype=np.uint8)
                buf[:len(raw)] = raw
                img = buf.reshape(src_h, src_w)
                out = img[np.ix_(rows_map, cols_map)]
                ids.append(int(did))
                pix.append(out.tobytes())
                sums.append(int(out.astype(np.int64).sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_w": pd.Series([dst_w] * len(ids), dtype="int32"),
                "out_h": pd.Series([dst_h] * len(ids), dtype="int32"),
                "pixels": pix,
                "pixel_sum": pd.Series(sums, dtype="int64"),
            })

    return spread(df).mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_SCHEMA = ("doc_id long, n_samples long, mean_amp double, "
                "rms double, n_sign_changes long")


def _round_away(x: float, places: int) -> float:
    """Round-half-away-from-zero (what Spark's round and DuckDB's
    round do) — Python/numpy round is half-even, which would diverge
    on exact .5 boundaries."""
    import math
    scale = 10 ** places
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def extract_audio_features(df: DataFrame, content_col: str = "content",
                           id_col: str = "doc_id") -> DataFrame:
    """Audio-style feature extraction over opaque binary blobs via
    Arrow-batched mapInPandas: each byte is an unsigned 8-bit sample
    centered at 128 (a real deployment would decode PCM/containers
    with soundfile; the byte interpretation keeps the operator
    deterministic and fully oracle-checkable while exercising the
    identical Spark plumbing — schema, batching, vectorized numpy).

    Per blob: sample count, mean amplitude, RMS, and the number of
    sign changes (a zero-crossing-rate proxy). Empty blobs emit no
    row. Sums are exact int64; the single division/sqrt at the end is
    deterministic."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                v = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64) - 128
                n = len(v)
                if n == 0:
                    continue
                mean = _round_away(float(v.sum()) / n, 4)
                rms = _round_away(float(np.sqrt(float((v * v).sum()) / n)), 4)
                neg = v < 0
                sc = int((neg[1:] != neg[:-1]).sum())
                rows.append((int(did), n, mean, rms, sc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "mean_amp",
                               "rms", "n_sign_changes"])

    return spread(df).mapInPandas(batches, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image decode: PPM (P6) — a complete decoder needs no codec
# library (header: "P6\n<w> <h>\n<maxval>\n", then w*h*3 RGB bytes),
# so this path actually parses and decodes, unlike the PIL-gated
# resize_images. JPEG/PNG stay behind the PIL import-try — entropy
# coding is a genuine library dependency; fixed-layout formats are
# not.
# ---------------------------------------------------------------------------

PPM_STATS_SCHEMA = ("doc_id long, width int, height int, n_pixels long, "
                    "mean_r double, mean_g double, mean_b double")


def make_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize a P6 PPM blob (pixels cycled/truncated to w*h*3)."""
    need = width * height * 3
    if len(pixels) == 0:
        pixels = b"\x00"
    body = (pixels * (need // len(pixels) + 1))[:need]
    return f"P6\n{width} {height}\n255\n".encode("ascii") + body


def attach_demo_ppm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Demo PPM corpus: per doc, a REAL P6 image whose dimensions
    derive from the row (w = 4 + doc_id % 5, h = 3 + ascii-length % 4)
    and whose pixel bytes cycle the document's ASCII bytes — fully
    deterministic, so an oracle can replay the expected channel
    statistics from the relational columns alone. Non-ASCII
    characters are dropped BEFORE byte derivation (the oracle's only
    per-character primitive is the code point, so byte-level parity
    requires a 1-byte-per-char alphabet), and an all-non-ASCII/empty
    text falls back to a single space byte (oracle: CASE L = 0)."""
    from ..core.partitioning import spread as _spread

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                raw0 = str(text).encode("ascii", "ignore")
                w = 4 + int(did) % 5
                h = 3 + len(raw0) % 4  # length BEFORE the fallback
                ids.append(int(did))
                blobs.append(make_ppm(w, h, raw0 or b" "))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "content": blobs,
                "media_type": pd.Series(["image/x-portable-pixmap"]
                                        * len(ids)),
            })

    return _spread(df.select(id_col, text_col)).mapInPandas(
        batches, "doc_id long, content binary, media_type string")


def decode_ppm_stats(df: DataFrame, content_col: str = "content",
                     id_col: str = "doc_id") -> DataFrame:
    """Decode P6 blobs: parse the header (magic, dimensions, maxval),
    reshape the payload to (h, w, 3), and emit per-channel means —
    the real decode path of the multimodal family. Malformed or
    non-P6 blobs are dropped (dead-letter semantics belong to the
    caller). Channel sums are exact int64; the one division per
    channel rounds half-away (both engines' round())."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob)
                if not blob.startswith(b"P6"):
                    continue
                # header = 3 whitespace-separated tokens after magic
                parts = blob.split(b"\n", 3)
                if len(parts) < 4:
                    continue
                try:
                    w, h = (int(t) for t in parts[1].split())
                    maxval = int(parts[2])
                except ValueError:
                    continue
                if maxval != 255 or w <= 0 or h <= 0:
                    continue
                body = parts[3][:w * h * 3]
                if len(body) < w * h * 3:
                    continue
                img = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
                sums = img.astype(np.int64).sum(axis=(0, 1))
                n = w * h
                rows.append((int(did), w, h, n,
                             _round_away(float(sums[0]) / n, 4),
                             _round_away(float(sums[1]) / n, 4),
                             _round_away(float(sums[2]) / n, 4)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_pixels",
                               "mean_r", "mean_g", "mean_b"])

    return spread(df).mapInPandas(batches, PPM_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode: WAV (RIFF/WAVE, 16-bit PCM) — like PPM, a
# complete container parse needs no codec library: RIFF chunk walk,
# `fmt ` fields (format tag, channels, sample rate, bit depth),
# `data` payload as little-endian int16 frames via numpy. Compressed
# codecs (MP3/AAC/OGG) would stay behind an import-try exactly like
# JPEG/PNG; linear PCM in a RIFF container is not a library problem.
# ---------------------------------------------------------------------------

WAV_META_SCHEMA = ("doc_id long, sample_rate int, n_channels int, "
                   "bits int, n_samples long, duration_ms long, "
                   "peak long, rms long")


def make_wav(samples: list[int], sample_rate: int = 8000,
             n_channels: int = 1) -> bytes:
    """Serialize 16-bit PCM ``samples`` (interleaved if stereo) as a
    canonical RIFF/WAVE blob — the writer half of the decode below."""
    import struct
    data = b"".join(struct.pack("<h", max(-32768, min(32767, s)))
                    for s in samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      byte_rate, n_channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def attach_demo_wav(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_samples: int = 400,
                    sample_rate: int = 8000) -> DataFrame:
    """Demo WAV corpus: per doc, a REAL mono 16-bit PCM blob whose
    samples derive deterministically from the text — sample i is
    ``(codepoint_i % 256 - 128) * 256`` (always within int16, so the
    writer's clamp never engages and the oracle's arithmetic is
    byte-exact) over the first
    ``max_samples`` characters — so an oracle can replay the decoded
    statistics from the relational ``text`` column alone. Empty texts
    emit no row (mirror the oracle with ``length(text) >= 1``)."""
    from ..core.partitioning import spread as _spread

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = str(text)[:max_samples]
                if not t:
                    continue
                samples = [(ord(ch) % 256 - 128) * 256 for ch in t]
                ids.append(int(did))
                blobs.append(make_wav(samples, sample_rate))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "content": blobs,
                "media_type": pd.Series(["audio/wav"] * len(ids)),
            })

    return _spread(df.select(id_col, text_col)).mapInPandas(
        batches, "doc_id long, content binary, media_type string")


def decode_wav_meta(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """Decode RIFF/WAVE blobs: walk the chunk list (tolerating extra
    chunks before/between `fmt ` and `data`), reject non-PCM or
    non-16-bit payloads, decode frames with numpy, and emit header
    fields plus integer signal statistics:

    - ``duration_ms`` = floor(n_samples * 1000 / sample_rate);
    - ``peak`` = max |sample| (int);
    - ``rms`` = floor(sqrt(floor(sum(sample^2) / n))) — every step
      integer or a correctly-rounded IEEE sqrt at magnitudes where
      floor(sqrt(k)) is exact in double, so the value replays in any
      engine.

    Malformed blobs are dropped (dead-letter semantics belong to the
    caller). One numpy pass per blob; Arrow batches bound memory."""
    import math
    import struct

    import numpy as np

    def _parse(blob: bytes):
        if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(blob):
            cid = blob[pos:pos + 4]
            (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            body = blob[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH",
                                                      fmt[:16])
        if tag != 1 or bits != 16 or ch < 1 or rate < 1:
            return None  # non-PCM / non-16-bit: a codec library's job
        frames = np.frombuffer(
            data[:len(data) - (len(data) % (2 * ch))], dtype="<i2")
        if frames.size == 0:
            return None
        n = frames.size // ch
        v = frames.astype(np.int64)
        sum_sq = int((v * v).sum())
        return (rate, ch, bits, n,
                n * 1000 // rate,
                int(np.abs(v).max()),
                int(math.sqrt(sum_sq // frames.size)))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[content_col]):
                parsed = _parse(bytes(blob))
                if parsed is not None:
                    rows.append((int(did),) + parsed)
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_channels",
                               "bits", "n_samples", "duration_ms",
                               "peak", "rms"])

    return spread(df).mapInPandas(batches, WAV_META_SCHEMA)

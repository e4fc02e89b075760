"""Empty-input and degenerate-edge behavior: operators must return
empty/identity results, not throw."""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.asof import asof_join
from luma_etl_data_platform_spark.operators.dedup import (
    exact_dedup_groups, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs,
)
from luma_etl_data_platform_spark.operators.merge import union_of_schemas
from luma_etl_data_platform_spark.operators.sampling import train_test_split
from luma_etl_data_platform_spark.schema_registry import SchemaRegistry


def _empty_docs(spark):
    return spark.createDataFrame([], T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]))


def test_dedup_ops_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert exact_dedup_groups(docs, "text", "doc_id").count() == 0
    assert ngram_jaccard_pairs(docs, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(docs, "text", "doc_id").count() == 0
    assert simhash_pairs(docs, "text", "doc_id").count() == 0


def test_dedup_short_documents(spark):
    # docs shorter than the shingle width must not crash or pair
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a"), (4, "exactly three words")],
        ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.1)
    assert pairs.count() == 0
    groups = exact_dedup_groups(docs, "text", "doc_id")
    assert groups.count() == 4   # all distinct (incl. empty-string fp)


def test_asof_empty_right_side(spark):
    import datetime as dt
    left = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], ["k", "t"])
    right = spark.createDataFrame([], T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("rt", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]))
    out = asof_join(left, right, "k", "t", "rt").collect()
    assert len(out) == 1 and out[0]["payload"] is None


def test_registry_tag_empty_frame(spark):
    df = spark.createDataFrame([], T.StructType([
        T.StructField("A", T.StringType())]))
    reg = SchemaRegistry()
    tagged = reg.tag_versions(df)
    assert tagged.count() == 0
    assert reg.versions == {0: ()}


def test_union_of_schemas_single_frame(spark):
    df = spark.createDataFrame([(1, "x")], ["b_col", "a_col"])
    out = union_of_schemas([df])
    assert out.columns == ["a_col", "b_col"]


def test_split_empty_frame(spark):
    df = _empty_docs(spark)
    train, test = train_test_split(df, "doc_id", 0.5)
    assert train.count() == 0 and test.count() == 0


# ---------------------------------------------------------------------------
# PPM decode (real image decode path)
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_decode(spark):
    from luma_etl_data_platform_spark.operators import multimodal as MM
    blob = MM.make_ppm(2, 2, bytes([10, 20, 30] * 4))
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, content binary")
    row = MM.decode_ppm_stats(df).collect()[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (2, 2, 4)
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (10.0, 20.0, 30.0)


def test_ppm_malformed_blobs_dropped(spark):
    from luma_etl_data_platform_spark.operators import multimodal as MM
    good = MM.make_ppm(3, 1, bytes(range(9)))
    bad_magic = b"P5\n3 1\n255\n" + bytes(9)
    truncated = MM.make_ppm(4, 4, bytes(10))[:-5]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad_magic)),
         (3, bytearray(truncated))],
        "doc_id long, content binary")
    rows = MM.decode_ppm_stats(df).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_ppm_pixel_cycling(spark):
    from luma_etl_data_platform_spark.operators import multimodal as MM
    # 1x2 image needs 6 bytes from a 4-byte source: cycles 0123 01
    blob = MM.make_ppm(2, 1, bytes([0, 1, 2, 3]))
    body = blob.split(b"\n", 3)[3]
    assert body == bytes([0, 1, 2, 3, 0, 1])


# ---------------------------------------------------------------------------
# WAV decode (real audio-container decode path)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_decode(spark):
    from luma_etl_data_platform_spark.operators import multimodal as MM
    blob = MM.make_wav([100, -200, 300, -32768], sample_rate=16000)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, content binary")
    row = MM.decode_wav_meta(df).collect()[0]
    assert (row["sample_rate"], row["n_channels"], row["bits"]) == \
        (16000, 1, 16)
    assert row["n_samples"] == 4
    assert row["duration_ms"] == 0          # 4 / 16000 s
    assert row["peak"] == 32768
    ss = 100 ** 2 + 200 ** 2 + 300 ** 2 + 32768 ** 2
    import math
    assert row["rms"] == int(math.sqrt(ss // 4))


def test_wav_stereo_and_chunk_walk(spark):
    """Stereo frames count as ONE sample per frame-set column pair?
    No — n_samples is frames per channel; and the parser tolerates
    extra RIFF chunks before fmt/data (real encoders emit LIST/INFO
    chunks)."""
    import struct
    from luma_etl_data_platform_spark.operators import multimodal as MM
    blob = MM.make_wav([1, -1, 2, -2, 3, -3], sample_rate=8000,
                       n_channels=2)  # 3 stereo frames
    # splice an unknown chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:12] + junk + blob[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    df = spark.createDataFrame([(7, bytearray(spliced))],
                               "doc_id long, content binary")
    row = MM.decode_wav_meta(df).collect()[0]
    assert row["n_channels"] == 2
    assert row["n_samples"] == 3
    assert row["peak"] == 3


def test_wav_malformed_and_nonpcm_dropped(spark):
    import struct
    from luma_etl_data_platform_spark.operators import multimodal as MM
    good = MM.make_wav([5, -5])
    not_riff = b"OggS" + bytes(40)
    truncated = good[:20]
    # format tag 3 (IEEE float) — a codec library's job, rejected
    nonpcm = bytearray(good)
    struct.pack_into("<H", nonpcm, 20, 3)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(not_riff)),
         (3, bytearray(truncated)), (4, bytes(nonpcm))],
        "doc_id long, content binary")
    rows = MM.decode_wav_meta(df).collect()
    assert [r["doc_id"] for r in rows] == [1]

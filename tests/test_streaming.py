"""Structured Streaming encode: micro-batches -> blocks, exactly-once."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import decode
from gorilla_stream_spark.generator import tokens_df
from gorilla_stream_spark.streaming import encode_stream


@pytest.mark.timeout(300)
def test_stream_encode_roundtrip(spark, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    out_dir = str(tmp_path / "stream_out")
    ckpt_dir = str(tmp_path / "stream_ckpt")

    toks = tokens_df(spark, 200, seed=3)
    toks.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = encode_stream(stream, out_dir, ckpt_dir, codec="auto", num_partitions=2)
    q.awaitTermination(240)

    enc = spark.read.parquet(out_dir)
    dec = decode(enc)
    assert dec.count() == 200
    joined = toks.alias("s").join(dec.alias("d"), "doc_id", "inner")
    bad = joined.filter(F.col("s.tokens") != F.col("d.tokens")).count()
    assert bad == 0
    # committed-batch markers exist (replay guard)
    assert os.path.isdir(os.path.join(ckpt_dir, "committed_batches"))


@pytest.mark.timeout(300)
def test_streaming_decode(spark, tmp_path):
    # decode is stateless -> works directly on a readStream of encoded
    # blocks (reference stream decompress, stream.ex:102-125)
    from gorilla_stream_spark import decode, encode
    from gorilla_stream_spark.engine import ENCODED_SCHEMA
    from gorilla_stream_spark.generator import tokens_df

    src = tokens_df(spark, 300, seed=9)
    enc_path = str(tmp_path / "enc")
    out_path = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    encode(src, codec="auto", num_partitions=2).write.parquet(enc_path)
    stream = spark.readStream.schema(ENCODED_SCHEMA).parquet(enc_path)
    q = (
        decode(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.read.parquet(out_path)
    assert out.count() == 300
    joined = src.alias("s").join(out.alias("d"), "doc_id", "inner")
    assert joined.filter(F.col("s.tokens") != F.col("d.tokens")).count() == 0


@pytest.mark.timeout(300)
def test_stateful_streaming_dedup(spark, tmp_path):
    # cross-batch exact dedup via applyInPandasWithState: later copies of
    # already-seen content are dropped even when they arrive batches later
    import time

    src_dir = str(tmp_path / "dd_src")
    out_dir = str(tmp_path / "dd_out")
    ck = str(tmp_path / "dd_ck")
    os.makedirs(src_dir)
    base = [(i, f"text number {i} " * 3) for i in range(100)]
    dup = [(1000 + i, f"text number {i} " * 3) for i in range(50)]  # dups of 0..49
    new = [(2000 + i, f"fresh content {i}") for i in range(50)]
    spark.createDataFrame(base, "doc_id long, text string").coalesce(1).write.parquet(
        src_dir + "/b1"
    )
    time.sleep(1.1)
    spark.createDataFrame(dup + new, "doc_id long, text string").coalesce(1).write.parquet(
        src_dir + "/b2"
    )

    from gorilla_stream_spark.streaming import dedup_stream

    schema = spark.read.parquet(src_dir + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src_dir + "/*")
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.read.parquet(out_dir)
    assert out.count() == 150  # 100 originals + 50 fresh, 50 dups dropped
    ids = {int(r.doc_id) for r in out.select("doc_id").collect()}
    assert not any(1000 <= i < 1100 for i in ids), "cross-batch dup leaked"
    assert all(2000 + i in ids for i in range(50))

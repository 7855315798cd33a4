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

"""Physical-plan shape gates: the scale properties the engine is designed
around, asserted on the actual executed plans so regressions fail loudly.

These pin the 100 TB story (README "Scale design"): one explicit shuffle
per encode, column pruning reaching the parquet scan, map-side window
dedup, broadcast-pruned verify joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import decode, encode
from gorilla_stream_spark.generator import tokens_df
from gorilla_stream_spark.textops import dedup_exact, neardup_pairs


@pytest.fixture(scope="module")
def toks_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "toks")
    tokens_df(spark, 300, seed=5).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_encode_plan_one_shuffle_and_pruned_scan(spark, toks_path):
    t = spark.read.parquet(toks_path)
    p = _plan(encode(t, num_partitions=4))
    # exactly ONE exchange: the salted repartition — at 100 TB every extra
    # Exchange re-moves the corpus
    assert p.count("Exchange") == 1, p
    assert "xxhash64(doc_id" in p
    # column pruning reaches the scan: n_tok is not read
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "n_tok" not in read_schema, read_schema
    assert "tokens" in read_schema


def test_decode_plan_prunes_manifest_columns(spark, toks_path, tmp_path):
    enc_path = str(tmp_path / "enc")
    t = spark.read.parquet(toks_path)
    encode(t, num_partitions=2).write.parquet(enc_path)
    p = _plan(decode(spark.read.parquet(enc_path)))
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    # stats/metric manifest columns never cross the scan on decode
    for col in ("enc_us", "raw_bytes", "enc_bytes", "codec", "part_id"):
        assert col not in read_schema, (col, read_schema)
    # (Spark truncates long ReadSchema strings, so assert on an early column)
    assert "doc_lens" in read_schema


def test_dedup_plan_has_mapside_window_group_limit(spark, toks_path):
    docs = spark.read.parquet(toks_path).select(
        F.col("doc_id"), F.concat_ws(",", "tokens").alias("text")
    )
    p = _plan(dedup_exact(docs))
    # Spark's WindowGroupLimit drops duplicate copies BEFORE the shuffle —
    # the property the README's dedup scale claim rests on
    assert "WindowGroupLimit" in p, p


def test_neardup_verify_uses_broadcast_pruning(spark, toks_path):
    docs = spark.read.parquet(toks_path).select(
        F.xxhash64("doc_id").alias("doc_id"),
        F.concat_ws(" ", F.expr("transform(tokens, t -> CAST(t AS STRING))")).alias("text"),
    )
    p = _plan(neardup_pairs(docs, threshold_pct=70))
    # the shingle tables are pruned to candidate ids via broadcast
    # semi-joins before the wide verify join
    assert "BroadcastExchange" in p, p
    assert "LeftSemi" in p, p

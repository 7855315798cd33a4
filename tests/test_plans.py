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


def test_cosine_neardup_plan_caps_buckets_and_prunes_vectors(spark):
    import numpy as np

    from gorilla_stream_spark.vectors import cosine_neardup_pairs

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = _plan(cosine_neardup_pairs(df, threshold_pct=90))
    # grouped pair generation on (band_idx, band_key): no window sort,
    # hot-bucket cap is the size filter on the aggregated id list
    assert "collect_list" in p and "Window" not in p, p
    # both vector sides are broadcast-semi-pruned to candidate ids, so
    # non-candidate qv arrays never shuffle into the verify join
    assert "BroadcastExchange" in p, p
    assert "LeftSemi" in p, p


def test_lsh_candidate_plan_has_bucket_cap_window(spark, toks_path):
    from gorilla_stream_spark.textops import lsh_candidate_pairs, shingle_minhash

    docs = spark.read.parquet(toks_path).select(
        F.xxhash64("doc_id").alias("__nd_id"),
        F.concat_ws(" ", F.expr("transform(tokens, t -> CAST(t AS STRING))")).alias(
            "__nd_text"
        ),
    )
    sig = shingle_minhash(docs, text_col="__nd_text", id_col="__nd_id", num_hashes=32)
    p = _plan(lsh_candidate_pairs(sig.select("doc_id", "sig"), num_hashes=32))
    # grouped pair generation: one aggregate on the band keys, no window
    # sort and no self-join hash build over the exploded band table
    assert "collect_list" in p, p
    assert "Window" not in p and "SortMergeJoin" not in p, p
    # uncapped path shares the same grouped shape (None only drops the
    # size filter) — the configuration where a megabucket would have
    # overflowed a single flattened pair array before the 2-stage explode
    p_uncapped = _plan(
        lsh_candidate_pairs(sig.select("doc_id", "sig"), num_hashes=32, max_bucket=None)
    )
    assert "collect_list" in p_uncapped and "Generate" in p_uncapped, p_uncapped


def test_train_pq_sample_uses_take_ordered(spark):
    # the PQ training sample must be a per-partition top-K + driver merge
    # (TakeOrderedAndProject), never a full sort shuffle of the corpus
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sampled = (
        df.select(
            F.col("embedding").alias("v"),
            F.col("vec_id").cast("string").alias("__id"),
            F.xxhash64(F.col("vec_id").cast("string"), F.lit(9176)).alias("__h"),
        )
        .orderBy("__h", "__id")
        .limit(32)
    )
    p = _plan(sampled)
    assert "TakeOrderedAndProject" in p, p


def test_compact_blocks_shuffles_only_small_blocks(spark, tmp_path):
    # the n_tokens threshold must reach the parquet scan as a pushed filter
    # and the single Exchange must sit on the small-block branch only — at
    # 100 TB the healthy majority of blocks never moves
    from gorilla_stream_spark import compact_blocks, encode
    from gorilla_stream_spark.generator import tokens_df

    path = str(tmp_path / "enc")
    enc = encode(tokens_df(spark, 200, seed=2), num_partitions=2, block_tokens=500)
    enc.write.parquet(path)
    tab = spark.read.parquet(path)
    p = _plan(compact_blocks(tab, block_tokens=8000))
    assert p.count("Exchange") == 1, p
    assert "PushedFilters: [IsNotNull(n_tokens)" in p or "LessThan(n_tokens" in p, p


def test_decode_docs_pushes_id_bounds_to_scan(spark, tmp_path):
    # point lookups must prune row groups via the (id_min, id_max) string
    # bounds — pushed to the parquet scan — before the fat doc_ids list
    # column is read
    from gorilla_stream_spark import encode
    from gorilla_stream_spark.engine import decode_docs
    from gorilla_stream_spark.generator import tokens_df

    path = str(tmp_path / "enc")
    encode(tokens_df(spark, 100, seed=3), num_partitions=2, block_tokens=800).write.parquet(path)
    tab = spark.read.parquet(path)
    p = _plan(decode_docs(tab, ["doc-42", "doc-7"]))
    assert "id_min" in p.split("PushedFilters")[1][:400], p

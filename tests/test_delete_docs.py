"""Targeted delete (delete_docs): exact removal, block-identity
preservation, passthrough byte-identity, full-block drops, bounds, and the
single-Arrow-pass plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.engine import decode, delete_docs, encode


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(21)
    rows = [
        (
            f"doc{i:04d}",
            [int(v) for v in rng.integers(0, 60000, size=int(rng.integers(15, 90)))],
            f"src{i % 2}",
        )
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).cache()


@pytest.fixture(scope="module")
def enc(spark, corpus, tmp_path_factory):
    # through storage, as in production (also freezes enc_us for the
    # byte-identity assertion)
    p = str(tmp_path_factory.mktemp("enc") / "t")
    encode(corpus, codec="auto", num_partitions=6).write.parquet(p)
    return spark.read.parquet(p)


def test_delete_exact(spark, corpus, enc):
    victims = ["doc0003", "doc0100", "doc0299"]
    out = delete_docs(enc, victims)
    got = {r["doc_id"]: r["tokens"] for r in decode(out).collect()}
    exp = {
        r["doc_id"]: r["tokens"]
        for r in corpus.filter(~F.col("doc_id").isin(victims)).collect()
    }
    assert got == exp


def test_untouched_blocks_byte_identical(spark, enc):
    victims = ["doc0000"]
    out = delete_docs(enc, victims)
    hit = F.arrays_overlap(F.col("doc_ids"), F.array(*[F.lit(v) for v in victims]))
    affected_ids = [r["block_id"] for r in enc.filter(hit).collect()]
    key = lambda df: {  # noqa: E731
        r["block_id"]: (bytes(r["buffer"]), r["crc32_buf"], r["enc_us"])
        for r in df.collect()
    }
    untouched = ~F.col("block_id").isin(affected_ids)
    assert key(out.filter(untouched)) == key(enc.filter(untouched))
    # the affected block kept its identity but shrank
    a = out.filter(F.col("block_id").isin(affected_ids)).collect()
    b = enc.filter(hit).collect()
    assert {r["block_id"] for r in a} == {r["block_id"] for r in b}
    assert all(r["n_docs"] == s["n_docs"] - 1 for r, s in zip(
        sorted(a, key=lambda r: r["block_id"]),
        sorted(b, key=lambda r: r["block_id"]),
    ))


def test_full_block_delete_drops_block(spark):
    # one tiny table where a whole block's docs are deleted
    rows = [(f"d{i}", list(range(10)), None) for i in range(4)]
    src = _df(spark, rows)
    e = encode(src, codec="raw", num_partitions=1)
    out = delete_docs(e, [f"d{i}" for i in range(4)])
    assert out.count() == 0


def _df(spark, spark_rows):
    return spark.createDataFrame(
        spark_rows, "doc_id string, tokens array<int>, source string"
    )


def test_empty_and_oversized(spark, enc):
    assert delete_docs(enc, []) is enc
    with pytest.raises(ValueError, match="targeted delete"):
        delete_docs(enc, [f"x{i}" for i in range(10_001)])


def test_missing_ids_noop(spark, corpus, enc):
    out = delete_docs(enc, ["nope1", "nope2"])
    assert out.count() == enc.count()
    got = decode(out).count()
    assert got == corpus.count()


def test_plan_single_arrow_pass(spark, enc):
    out = delete_docs(enc, ["doc0001"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") + plan.count("mapInArrow") == 1
    assert "Exchange" not in plan  # shuffle-free: filter + kernel + union


def test_decode_docs_after_delete(spark, corpus, enc):
    # point lookup still works on the rewritten table (identity preserved)
    out = delete_docs(enc, ["doc0005"])
    hit = decode(out.filter(F.lit(True)), strict=True)
    assert hit.filter(F.col("doc_id") == "doc0005").count() == 0
    one = {
        r["doc_id"]: r["tokens"]
        for r in decode(out).filter(F.col("doc_id") == "doc0006").collect()
    }
    exp = {
        r["doc_id"]: r["tokens"]
        for r in corpus.filter(F.col("doc_id") == "doc0006").collect()
    }
    assert one == exp

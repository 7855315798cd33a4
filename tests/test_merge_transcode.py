"""merge_tables (O70, metadata-only union) and transcode_blocks (O71,
shuffle-free codec migration)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import decode, encode, merge_tables, transcode_blocks


def _corpus(spark, prefix, n, seed):
    rng = np.random.default_rng(seed)
    rows = [
        (f"{prefix}{i:03d}", [int(v) for v in rng.integers(0, 500, size=80)], "s")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")


@pytest.fixture(scope="module")
def two_tables(spark):
    a = _corpus(spark, "a", 20, 1)
    b = _corpus(spark, "b", 30, 2)
    ea = encode(a, codec="auto", num_partitions=3).cache()
    eb = encode(b, codec="auto", num_partitions=4).cache()
    ea.count(), eb.count()
    return a, b, ea, eb


class TestMergeTables:
    def test_block_ids_unique_and_identity_rule(self, spark, two_tables):
        _, _, ea, eb = two_tables
        m = merge_tables(ea, eb)
        n = m.count()
        assert m.select("block_id").distinct().count() == n
        bad = m.filter(
            F.col("block_id")
            != F.shiftleft(F.col("part_id").cast("long"), 24).bitwiseOR(
                F.col("seq_in_part").cast("long")
            )
        ).count()
        assert bad == 0

    def test_decode_equals_union(self, spark, two_tables):
        a, b, ea, eb = two_tables
        got = {r["doc_id"]: r["tokens"] for r in decode(merge_tables(ea, eb)).collect()}
        want = {r["doc_id"]: r["tokens"] for r in a.unionByName(b).collect()}
        assert got == want

    def test_buffers_untouched(self, spark, two_tables):
        _, _, ea, eb = two_tables
        before = sorted(r[0] for r in eb.select("crc32_buf").collect())
        after = sorted(
            r[0]
            for r in merge_tables(ea, eb)
            .join(ea.select("block_id"), "block_id", "left_anti")
            .select("crc32_buf")
            .collect()
        )
        assert before == after

    def test_part_ids_disjoint_and_dense_above_a(self, spark, two_tables):
        _, _, ea, eb = two_tables
        m = merge_tables(ea, eb)
        a_parts = {r[0] for r in ea.select("part_id").distinct().collect()}
        all_parts = {r[0] for r in m.select("part_id").distinct().collect()}
        b_parts = all_parts - a_parts
        assert len(b_parts) == eb.select("part_id").distinct().count()
        assert min(b_parts) == max(a_parts) + 1

    def test_merge_then_compact_roundtrip(self, spark, two_tables):
        from gorilla_stream_spark import compact_blocks

        a, b, ea, eb = two_tables
        comp = compact_blocks(merge_tables(ea, eb), num_partitions=2)
        got = {r["doc_id"]: r["tokens"] for r in decode(comp).collect()}
        want = {r["doc_id"]: r["tokens"] for r in a.unionByName(b).collect()}
        assert got == want


class TestTranscodeBlocks:
    def test_decode_bit_identical(self, spark, two_tables):
        a, _, ea, _ = two_tables
        t = transcode_blocks(ea, codec="for")
        got = {r["doc_id"]: r["tokens"] for r in decode(t).collect()}
        want = {r["doc_id"]: r["tokens"] for r in a.collect()}
        assert got == want

    def test_codec_and_lineage_columns(self, spark, two_tables):
        _, _, ea, _ = two_tables
        t = transcode_blocks(ea, codec="raw").cache()
        assert {r[0] for r in t.select("codec").distinct().collect()} == {"raw"}
        # identity + raw lineage preserved; buffer actually changed
        keys = ["block_id", "part_id", "seq_in_part", "n_docs", "n_tokens", "crc32_raw"]
        sa = sorted(map(repr, ea.select(*keys).collect()))
        st = sorted(map(repr, t.select(*keys).collect()))
        assert sa == st
        joined = ea.alias("x").join(t.alias("y"), "block_id").select(
            (F.col("x.crc32_buf") != F.col("y.crc32_buf")).alias("changed")
        )
        assert joined.filter("changed").count() > 0
        t.unpersist()

    def test_container_roundtrip(self, spark, two_tables):
        a, _, ea, _ = two_tables
        t = transcode_blocks(ea, codec="auto", container="zlib")
        got = {r["doc_id"]: r["tokens"] for r in decode(t).collect()}
        want = {r["doc_id"]: r["tokens"] for r in a.collect()}
        assert got == want

    def test_shuffle_free_plan(self, spark, two_tables):
        _, _, ea, _ = two_tables
        t = transcode_blocks(ea, codec="rle")
        plan = t._jdf.queryExecution().executedPlan().toString()
        own = plan.split("InMemoryTableScan")[0]
        assert "Exchange" not in own

    def test_corruption_fails_loud(self, spark, two_tables):
        _, _, ea, _ = two_tables
        bad = ea.withColumn("crc32_raw", F.col("crc32_raw") + 1)
        with pytest.raises(Exception, match="crc32"):
            transcode_blocks(bad).collect()


def test_merge_lazy_uncached_encodes(spark):
    """Regression: the encoder stamps part_id from TaskContext.partitionId(),
    which materializes DIFFERENTLY inside a union plan than standalone (the
    second branch's partition ids continue from the first).  A re-stamp
    keyed on a separately-evaluated id snapshot silently dropped all of B;
    the column-arithmetic shift must survive fully lazy inputs."""
    a = _corpus(spark, "la", 12, 7)
    b = _corpus(spark, "lb", 14, 8)
    ea = encode(a, codec="auto", num_partitions=2)  # NOT cached, NOT written
    eb = encode(b, codec="auto", num_partitions=2)
    m = merge_tables(ea, eb)
    got = {r["doc_id"]: r["tokens"] for r in decode(m).collect()}
    want = {r["doc_id"]: r["tokens"] for r in a.unionByName(b).collect()}
    assert got == want
    n = m.count()
    assert m.select("block_id").distinct().count() == n


def test_merge_part_id_overflow_raises(spark):
    # the guard lives on the evaluated part_id expression (a dropped-column
    # assert could be pruned); an overflowing shift must fail the action
    import pytest
    from pyspark.errors import SparkRuntimeException

    from gorilla_stream_spark.engine import merge_tables

    cols = "block_id long, part_id int, seq_in_part int"
    a = spark.createDataFrame([((2**31 - 2) << 24, 2**31 - 2, 0)], cols)
    b = spark.createDataFrame([(0, 0, 0)], cols)
    with pytest.raises(SparkRuntimeException, match="overflow"):
        merge_tables(a, b).collect()
    # non-overflow path unaffected
    ok = merge_tables(b, b)
    assert {r["part_id"] for r in ok.collect()} == {0, 1}

"""Token membership index (O66): exactness vs brute force, zone-map and
bloom pruning effectiveness, false-positive safety, self-describing params,
JVM-only prune plan, and corruption propagation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import encode
from gorilla_stream_spark.index import (
    build_token_index,
    find_docs_with_token,
    prune_blocks_for_token,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")


@pytest.fixture(scope="module")
def enc_and_truth(spark):
    """40 docs over two token regimes: low tokens [0,100) everywhere, the
    needle token 777777 only in docs 30..34.  Small block_tokens so the
    table spans many blocks and pruning is observable."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        toks = [int(v) for v in rng.integers(0, 100, size=120)]
        if 30 <= i <= 34:
            toks[7] = 777777
            toks[80] = 777777
        rows.append((f"doc{i:02d}", toks, "s"))
    df = _corpus(spark, rows)
    enc = encode(df, codec="auto", num_partitions=2, block_tokens=500)
    enc = enc.cache()
    enc.count()
    truth = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            F.size(F.filter("tokens", lambda t: t == 777777)).alias("n"),
        ).collect()
        if r["n"] > 0
    }
    return enc, truth


def test_find_docs_exact(spark, enc_and_truth):
    enc, truth = enc_and_truth
    idx = build_token_index(enc)
    got = {r["doc_id"]: r["n_hits"] for r in find_docs_with_token(enc, idx, 777777).collect()}
    assert got == truth
    assert all(v == 2 for v in got.values())


def test_common_token_matches_brute_force(spark, enc_and_truth):
    enc, _ = enc_and_truth
    from gorilla_stream_spark import decode

    idx = build_token_index(enc)
    got = {r["doc_id"]: r["n_hits"] for r in find_docs_with_token(enc, idx, 50).collect()}
    truth = {
        r["doc_id"]: r["n"]
        for r in decode(enc)
        .select("doc_id", F.size(F.filter("tokens", lambda t: t == 50)).alias("n"))
        .collect()
        if r["n"] > 0
    }
    assert got == truth and len(truth) > 0


def test_absent_token_empty_and_prunes_everything(spark, enc_and_truth):
    enc, _ = enc_and_truth
    idx = build_token_index(enc)
    # outside every block's [tok_min, tok_max]: zone map alone kills it
    assert prune_blocks_for_token(enc, idx, 10**6 + 1).count() == 0
    assert find_docs_with_token(enc, idx, 10**6 + 1).count() == 0


def test_needle_prunes_most_blocks(spark, enc_and_truth):
    enc, truth = enc_and_truth
    idx = build_token_index(enc)
    total = enc.count()
    cand = prune_blocks_for_token(enc, idx, 777777).count()
    assert cand < total, (cand, total)  # pruning actually happened
    got = {r["doc_id"]: r["n_hits"] for r in find_docs_with_token(enc, idx, 777777).collect()}
    assert got == truth  # and stayed exact


def test_self_describing_params(spark, enc_and_truth):
    enc, truth = enc_and_truth
    idx = build_token_index(enc, bloom_words=4, k=3)
    got = {r["doc_id"]: r["n_hits"] for r in find_docs_with_token(enc, idx, 777777).collect()}
    assert got == truth


def test_bloom_false_positive_safe(spark):
    """1-word bloom over a high-cardinality block saturates the filter —
    results must remain exact (decode verifies), only pruning degrades."""
    rng = np.random.default_rng(3)
    rows = [
        (f"d{i}", [int(v) for v in rng.integers(0, 2**20, size=300)], "s")
        for i in range(10)
    ]
    df = _corpus(spark, rows)
    enc = encode(df, codec="auto", num_partitions=1, block_tokens=600)
    idx = build_token_index(enc, bloom_words=1, k=2)
    probe = int(df.select(F.element_at("tokens", 5)).first()[0])
    truth = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(F.filter("tokens", lambda t: t == probe)).alias("n")
        ).collect()
        if r["n"] > 0
    }
    got = {r["doc_id"]: r["n_hits"] for r in find_docs_with_token(enc, idx, probe).collect()}
    assert got == truth


def test_index_is_small_and_map_only(spark, enc_and_truth):
    enc, _ = enc_and_truth
    idx = build_token_index(enc)
    assert idx.count() == enc.count()  # one row per block
    plan = idx._jdf.queryExecution().executedPlan().toString()
    # no shuffle in the index pass itself (the cached encode lineage below
    # InMemoryTableScan keeps its own exchanges — cut the plan there)
    own = plan.split("InMemoryTableScan")[0]
    assert "Exchange" not in own


def test_prune_plan_is_jvm_only(spark, enc_and_truth):
    enc, _ = enc_and_truth
    idx = build_token_index(enc).cache()
    idx.count()
    cand = idx.filter(
        (F.col("tok_min") <= 777777) & (F.col("tok_max") >= 777777)
    ).select("block_id")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    idx.unpersist()


def test_corruption_fails_loud_in_index_build(spark, enc_and_truth):
    enc, _ = enc_and_truth
    bad = enc.withColumn("crc32_raw", F.col("crc32_raw") + 1)
    with pytest.raises(Exception, match="crc32"):
        build_token_index(bad).collect()


class TestPhraseSearch:
    @pytest.fixture(scope="class")
    def phrase_enc(self, spark):
        """Docs with a planted 3-token phrase, incl. overlapping repeats and
        a boundary case where the phrase tokens exist but never consecutively."""
        from gorilla_stream_spark.index import find_docs_with_phrase  # noqa: F401

        rows = [
            ("p0", [1, 2, 3, 9, 1, 2, 3], "s"),          # 2 hits
            ("p1", [5, 1, 2, 9, 2, 3, 9], "s"),          # tokens present, never consecutive
            ("p2", [1, 1, 1, 2, 3, 4], "s"),             # 1 hit
            ("p3", [7, 7, 7, 7], "s"),                   # no phrase tokens
            ("p4", [1, 2, 3], "s"),                      # exact-doc hit
            ("p5", [2, 2, 2, 2, 2], "s"),                # overlap stress (phrase 2,2)
        ]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
        enc = encode(df, codec="auto", num_partitions=2, block_tokens=8).cache()
        enc.count()
        return enc

    def test_phrase_hits_exact(self, spark, phrase_enc):
        from gorilla_stream_spark.index import find_docs_with_phrase

        idx = build_token_index(phrase_enc)
        got = {
            r["doc_id"]: r["n_hits"]
            for r in find_docs_with_phrase(phrase_enc, idx, [1, 2, 3]).collect()
        }
        assert got == {"p0": 2, "p2": 1, "p4": 1}

    def test_overlapping_counts(self, spark, phrase_enc):
        from gorilla_stream_spark.index import find_docs_with_phrase

        idx = build_token_index(phrase_enc)
        got = {
            r["doc_id"]: r["n_hits"]
            for r in find_docs_with_phrase(phrase_enc, idx, [2, 2]).collect()
        }
        assert got == {"p5": 4}  # overlapping position-scan semantics

    def test_no_cross_doc_match(self, spark):
        from gorilla_stream_spark.index import find_docs_with_phrase

        # "ab" at the end of one doc and "c" starting the next, same block:
        # the straddling window must NOT count
        rows = [("a", [8, 1, 2], "s"), ("b", [3, 8, 8], "s")]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
        enc = encode(df, codec="auto", num_partitions=1, block_tokens=100)
        idx = build_token_index(enc)
        assert find_docs_with_phrase(enc, idx, [1, 2, 3]).count() == 0

    def test_phrase_prunes_on_any_missing_token(self, spark, phrase_enc):
        from gorilla_stream_spark.index import find_docs_with_phrase

        idx = build_token_index(phrase_enc)
        # 999 absent everywhere: conjunction prunes all blocks
        res = find_docs_with_phrase(phrase_enc, idx, [1, 2, 999])
        assert res.count() == 0

    def test_single_token_phrase_delegates(self, spark, phrase_enc):
        from gorilla_stream_spark.index import find_docs_with_phrase

        idx = build_token_index(phrase_enc)
        a = sorted((r["doc_id"], r["n_hits"]) for r in find_docs_with_phrase(phrase_enc, idx, [2]).collect())
        b = sorted((r["doc_id"], r["n_hits"]) for r in find_docs_with_token(phrase_enc, idx, 2).collect())
        assert a == b

    def test_empty_phrase_raises(self, spark, phrase_enc):
        from gorilla_stream_spark.index import find_docs_with_phrase

        idx = build_token_index(phrase_enc)
        with pytest.raises(ValueError, match="at least one token"):
            find_docs_with_phrase(phrase_enc, idx, [])


def test_incremental_index_union_equals_rebuild(spark, enc_and_truth):
    """Index rows are pure per-block functions: indexing an appended delta
    and unioning with the old index is exactly a full rebuild."""
    enc, _ = enc_and_truth
    old_blocks = enc.filter(F.col("part_id") == 0)
    new_blocks = enc.filter(F.col("part_id") != 0)
    incremental = build_token_index(old_blocks).unionByName(
        build_token_index(new_blocks)
    )
    full = build_token_index(enc)
    a = sorted(map(repr, incremental.collect()))
    b = sorted(map(repr, full.collect()))
    assert a == b


def test_literal_in_prune_pushes_to_parquet_scan(spark, tmp_path, enc_and_truth):
    """Selective prune must reach the parquet row-group stats: the plan's
    scan node carries PushedFilters In(block_id, ...)."""
    enc, truth = enc_and_truth
    path = str(tmp_path / "enc_pq")
    enc.write.parquet(path)
    on_disk = spark.read.parquet(path)
    idx = build_token_index(on_disk)
    pruned = prune_blocks_for_token(on_disk, idx, 777777)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(block_id" in plan, plan[:1500]
    got = {
        r["doc_id"]: r["n_hits"]
        for r in find_docs_with_token(on_disk, idx, 777777).collect()
    }
    assert got == truth


def test_prune_falls_back_to_broadcast_above_limit(spark, enc_and_truth, monkeypatch):
    import gorilla_stream_spark.index as idxmod

    enc, truth = enc_and_truth
    idx = build_token_index(enc)
    monkeypatch.setattr(idxmod, "PUSHDOWN_CANDIDATE_LIMIT", 0)
    got = {
        r["doc_id"]: r["n_hits"]
        for r in idxmod.find_docs_with_token(enc, idx, 777777).collect()
    }
    assert got == truth


def test_mixed_parameter_union_index_no_false_negatives(spark, enc_and_truth):
    # incremental maintenance unions indexes that may have been built with
    # different (bloom_words, k); probes must be computed per parameter
    # group and OR'd — rows built with the "other" parameters previously
    # never decoded (silent false negatives)
    enc, truth = enc_and_truth
    blocks = sorted(r["block_id"] for r in enc.select("block_id").collect())
    half = set(blocks[: len(blocks) // 2])
    enc_a = enc.filter(F.col("block_id").isin([int(b) for b in half]))
    enc_b = enc.filter(~F.col("block_id").isin([int(b) for b in half]))
    mixed = build_token_index(enc_a, bloom_words=4, k=3).unionByName(
        build_token_index(enc_b, bloom_words=8, k=4)
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in find_docs_with_token(enc, mixed, 777777).collect()
    }
    assert got == truth

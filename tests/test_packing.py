"""Sequence packing (O60) — fixed-length training rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.packing import pack_sequences


def _mk(spark, docs, n_part=3):
    rows = [(i, list(t)) for i, t in enumerate(docs)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>").repartition(
        n_part
    )


def _reference_pack(docs, L, drop_last=False):
    """Straight-line oracle: concat in doc order, slice, spans at doc cuts."""
    flat = [t for d in docs for t in d]
    ends = np.cumsum([len(d) for d in docs])
    out = {}
    for s in range(0, len(flat), L):
        chunk = flat[s : s + L]
        if drop_last and len(chunk) < L:
            continue
        a, b = s, s + len(chunk)
        cuts = [e for e in ends if a < e < b]
        edges = [a] + cuts + [b]
        spans = [
            edges[i + 1] - edges[i] for i in range(len(edges) - 1) if edges[i + 1] > edges[i]
        ]
        out[s // L] = (chunk, spans)
    return out


def _collect(df):
    return {
        int(r.seq_id): (list(r.tokens), list(r.doc_spans), int(r.n_tok))
        for r in df.collect()
    }


def test_pack_matches_reference_exactly(spark):
    rng = np.random.default_rng(12)
    docs = [list(map(int, rng.integers(0, 1000, rng.integers(1, 40)))) for _ in range(57)]
    L = 64
    got = _collect(pack_sequences(_mk(spark, docs), L, num_partitions=4))
    want = _reference_pack(docs, L)
    assert set(got) == set(want)
    for sid, (chunk, spans) in want.items():
        assert got[sid][0] == chunk, sid
        assert got[sid][1] == spans, sid
        assert got[sid][2] == len(chunk)
        assert sum(got[sid][1]) == got[sid][2]


def test_pack_invariant_to_partitioning(spark):
    rng = np.random.default_rng(5)
    docs = [list(map(int, rng.integers(0, 99, rng.integers(0, 25)))) for _ in range(40)]
    a = _collect(pack_sequences(_mk(spark, docs, n_part=1), 32, num_partitions=2))
    b = _collect(pack_sequences(_mk(spark, docs, n_part=7), 32, num_partitions=6))
    assert a == b


def test_pack_duplicate_ids_deterministic(spark):
    # duplicate doc_ids with DIFFERENT token content: the content-hash
    # tiebreaker must pin one packed stream across input partitionings /
    # row orders (before it, equal-key order after the range shuffle was
    # arbitrary and chunk hashes could differ run-to-run)
    rng = np.random.default_rng(9)
    docs = [list(map(int, rng.integers(0, 99, rng.integers(1, 20)))) for _ in range(30)]
    rows = [(i % 7, list(t)) for i, t in enumerate(docs)]  # ids collide 4-5x
    df_a = spark.createDataFrame(rows, "doc_id long, tokens array<int>").repartition(1)
    df_b = spark.createDataFrame(rows[::-1], "doc_id long, tokens array<int>").repartition(5)
    a = _collect(pack_sequences(df_a, 32, num_partitions=2))
    b = _collect(pack_sequences(df_b, 32, num_partitions=4))
    assert a == b


def test_pack_long_doc_spans_chunks(spark):
    # one 300-token doc at L=64 -> split across 5 chunks, single span each
    docs = [[7] * 300]
    got = _collect(pack_sequences(_mk(spark, docs, n_part=1), 64, num_partitions=1))
    assert len(got) == 5
    assert got[4][2] == 300 - 4 * 64
    for sid in got:
        assert len(got[sid][1]) == 1  # one doc -> one span per chunk


def test_pack_drop_last(spark):
    docs = [[1] * 10, [2] * 10, [3] * 5]  # 25 tokens, L=8 -> 3 full + 1 partial
    full = _collect(pack_sequences(_mk(spark, docs), 8))
    assert len(full) == 4 and full[3][2] == 1
    dropped = _collect(pack_sequences(_mk(spark, docs), 8, drop_last=True))
    assert len(dropped) == 3 and all(v[2] == 8 for v in dropped.values())


def test_pack_rejects_bad_seq_len_and_nulls(spark):
    docs = [[1, 2, 3]]
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_mk(spark, docs), 0)
    df = spark.createDataFrame([(0, None)], "doc_id long, tokens array<int>")
    with pytest.raises(Exception, match="null"):
        pack_sequences(df, 8).collect()


def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, tokens array<int>")
    assert pack_sequences(df, 16).count() == 0


def test_write_training_shards_balanced_deterministic(spark, tmp_path):
    from gorilla_stream_spark.packing import shard_manifest, write_training_shards

    rng = np.random.default_rng(5)
    docs = [list(map(int, rng.integers(0, 999, rng.integers(10, 60)))) for _ in range(80)]
    packed = pack_sequences(_mk(spark, docs), 64, num_partitions=4)
    n_seqs = packed.count()
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(packed, p1, seqs_per_shard=4)
    write_training_shards(packed, p2, seqs_per_shard=4)
    m1 = sorted(shard_manifest(spark, p1).collect(), key=lambda r: r["shard_id"])
    m2 = sorted(shard_manifest(spark, p2).collect(), key=lambda r: r["shard_id"])
    assert [r.asDict() for r in m1] == [r.asDict() for r in m2]  # deterministic
    # balance: every shard except possibly the last holds exactly 4 seqs
    assert all(r["n_seqs"] == 4 for r in m1[:-1]) and 0 < m1[-1]["n_seqs"] <= 4
    assert sum(r["n_seqs"] for r in m1) == n_seqs
    # density: min/max are exactly the shard's id range
    for r in m1:
        assert r["min_seq"] == r["shard_id"] * 4
        assert r["max_seq"] == r["min_seq"] + r["n_seqs"] - 1
    # shard membership is a pure function of seq_id → directory pruning:
    # reading one shard dir returns exactly its sequences
    one = spark.read.parquet(f"{p1}/shard_id=2")
    assert sorted(r["seq_id"] for r in one.select("seq_id").collect()) == [8, 9, 10, 11]


def test_write_training_shards_rejects_bad_size(spark, tmp_path):
    from gorilla_stream_spark.packing import write_training_shards

    packed = pack_sequences(_mk(spark, [[1, 2, 3]]), 2)
    with pytest.raises(ValueError, match="positive"):
        write_training_shards(packed, str(tmp_path / "x"), seqs_per_shard=0)

"""Compression-aware clustering (O67): ratio gain on an interleaved
multi-family corpus, round-trip equality, single-exchange plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark import decode, encode
from gorilla_stream_spark.skew import cluster_for_compression


@pytest.fixture(scope="module")
def interleaved(spark):
    """Two content families deliberately interleaved by id so the default
    hash layout mixes them into every block: family A draws from a narrow
    low range, family B from a wide high range."""
    rng = np.random.default_rng(23)
    rows = []
    for i in range(60):
        if i % 2 == 0:
            toks = [int(v) for v in rng.integers(10, 20, size=150)]
            src = "narrow"
        else:
            toks = [int(v) for v in rng.integers(100_000, 2_000_000, size=150)]
            src = "wide"
        rows.append((f"d{i:03d}", toks, src))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    )


def test_clustering_improves_ratio(spark, interleaved):
    plain = encode(interleaved, codec="auto", num_partitions=4, block_tokens=1200)
    clustered = encode(
        cluster_for_compression(interleaved, by=("source",), num_partitions=4),
        codec="auto",
        repartition=False,
        block_tokens=1200,
    )
    b_plain = plain.agg(F.sum("enc_bytes")).collect()[0][0]
    b_clust = clustered.agg(F.sum("enc_bytes")).collect()[0][0]
    assert b_clust < b_plain, (b_clust, b_plain)


def test_clustered_blocks_are_source_homogeneous(spark, interleaved):
    clustered = encode(
        cluster_for_compression(interleaved, by=("source",), num_partitions=4),
        codec="auto",
        repartition=False,
        block_tokens=1200,
    )
    homo = clustered.select(
        (F.size(F.array_distinct("sources")) == 1).alias("h")
    ).collect()
    # every block except at most the per-partition family boundary is pure
    assert sum(1 for r in homo if r["h"]) >= len(homo) - 4


def test_round_trip_after_clustering(spark, interleaved):
    clustered = encode(
        cluster_for_compression(interleaved, num_partitions=3),
        codec="auto",
        repartition=False,
    )
    got = {r["doc_id"]: r["tokens"] for r in decode(clustered).collect()}
    want = {r["doc_id"]: r["tokens"] for r in interleaved.collect()}
    assert got == want


def test_single_range_exchange(spark, interleaved):
    out = cluster_for_compression(interleaved, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    assert plan.count("Exchange") == 1


def test_works_without_group_columns(spark, interleaved):
    # prefix-only clustering (by=()) still legal and lossless
    out = cluster_for_compression(interleaved, by=(), num_partitions=2)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in interleaved.select("doc_id").collect()
    )

"""Staged pipeline orchestrator: stage composition, fingerprinted resume
(skip-unchanged / recompute-downstream-of-an-edit), validation errors,
decontaminate anti-join, and the packed-encode lineage column."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.pipeline import PIPELINE_STAGES, run_pipeline


def _corpus(spark, n=200, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = [int(v) for v in rng.integers(0, 3000, size=int(rng.integers(30, 90)))]
        rows.append((str(i), toks, f"src{i % 2}"))
    # plant exact duplicates: docs 190..199 repeat the content of 0..9
    for i in range(10):
        rows[190 + i] = (str(190 + i), rows[i][1], rows[i][2])
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).withColumn("n_tok", F.size("tokens").cast("int"))


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pl") / "corpus")
    _corpus(spark).write.mode("overwrite").parquet(p)
    return p


def test_full_pipeline_and_packed_lineage(spark, corpus_path, tmp_path):
    from gorilla_stream_spark.engine import decode_multi

    wd = str(tmp_path / "wd")
    out = str(tmp_path / "enc")
    reports = run_pipeline(
        spark,
        corpus_path,
        wd,
        out,
        stages=["clean", "dedup", "sample", "pack", "encode"],
        sample_fractions=0.8,
        seq_len=128,
        num_partitions=4,
    )
    assert [r["stage"] for r in reports] == [
        "clean", "dedup", "sample", "pack", "encode",
    ]
    assert all(not r["skipped"] for r in reports)
    by = {r["stage"]: r for r in reports}
    assert by["clean"]["rows"] == 200
    assert by["dedup"]["rows"] == 190  # 10 planted duplicates dropped
    assert 0 < by["sample"]["rows"] < 190
    # packed sequences decode with their doc_spans lineage column intact
    dec = decode_multi(spark.read.parquet(out), ["tokens", "doc_spans"])
    rows = dec.collect()
    assert len(rows) == by["pack"]["rows"]
    short = [r for r in rows if len(r["tokens"]) != 128]
    assert len(short) <= 1  # only the final partial chunk may be short
    for r in rows:
        assert sum(r["doc_spans"]) == len(r["tokens"]) <= 128


def test_resume_skips_then_recomputes_downstream(spark, corpus_path, tmp_path):
    wd = str(tmp_path / "wd")
    out = str(tmp_path / "enc")
    kw = dict(stages=["clean", "dedup", "encode"], num_partitions=4)
    r1 = run_pipeline(spark, corpus_path, wd, out, **kw)
    assert all(not r["skipped"] for r in r1)
    # identical re-run: every stage skipped, same row counts
    r2 = run_pipeline(spark, corpus_path, wd, out, **kw)
    assert all(r["skipped"] for r in r2)
    assert [r["rows"] for r in r2] == [r["rows"] for r in r1]
    # editing a terminal-stage param recomputes ONLY that stage
    r3 = run_pipeline(spark, corpus_path, wd, out, stages=["clean", "dedup", "encode"],
                      num_partitions=4, codec="rle")
    assert [r["skipped"] for r in r3] == [True, True, False]
    # --no-resume recomputes everything
    r4 = run_pipeline(spark, corpus_path, wd, out, resume=False, **kw)
    assert all(not r["skipped"] for r in r4)


def test_decontaminate_stage_drops_leaked_docs(spark, corpus_path, tmp_path):
    ev_path = str(tmp_path / "eval")
    corpus = spark.read.parquet(corpus_path)
    # eval set = exact copies of docs 5..7 under new ids → those train
    # docs must be dropped
    corpus.filter(F.col("doc_id").isin("5", "6", "7")).select(
        (F.col("doc_id").cast("long") + 10_000).cast("string").alias("doc_id"),
        "tokens",
        "source",
        "n_tok",
    ).write.mode("overwrite").parquet(ev_path)
    wd = str(tmp_path / "wd")
    out = str(tmp_path / "enc")
    reports = run_pipeline(
        spark,
        corpus_path,
        wd,
        out,
        stages=["dedup", "decontaminate", "encode"],
        eval_path=ev_path,
        num_partitions=4,
    )
    by = {r["stage"]: r for r in reports}
    assert by["decontaminate"]["rows"] == by["dedup"]["rows"] - 3
    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(by["decontaminate"]["output"]).select("doc_id").collect()
    }
    # dedup keeps ONE copy per content (docs 195-197 duplicate 5-7; string
    # id order decides which survives dedup) — decontaminate must then
    # remove whichever copy survived
    assert not {"5", "6", "7", "195", "196", "197"} & survivors


def test_stage_validation_errors(spark, corpus_path, tmp_path):
    wd, out = str(tmp_path / "wd"), str(tmp_path / "enc")
    with pytest.raises(ValueError, match="canonical order"):
        run_pipeline(spark, corpus_path, wd, out, stages=["dedup", "clean"])
    with pytest.raises(ValueError, match="unknown stages"):
        run_pipeline(spark, corpus_path, wd, out, stages=["clean", "shuffle"])
    with pytest.raises(ValueError, match="eval_path"):
        run_pipeline(spark, corpus_path, wd, out, stages=["decontaminate"])
    with pytest.raises(ValueError, match="min_logprob"):
        run_pipeline(spark, corpus_path, wd, out, stages=["score"])
    with pytest.raises(ValueError, match="sample_fractions"):
        run_pipeline(spark, corpus_path, wd, out, stages=["sample"])
    with pytest.raises(ValueError, match="canonical order"):
        run_pipeline(spark, corpus_path, wd, out, stages=["encode", "pack"])
    with pytest.raises(ValueError, match="canonical order"):
        run_pipeline(spark, corpus_path, wd, out, stages=["clean", "clean"])
    assert PIPELINE_STAGES[-1] == "encode"


def test_score_stage_filters_low_probability(spark, corpus_path, tmp_path):
    from gorilla_stream_spark.vocab import unigram_logprob

    corpus = spark.read.parquet(corpus_path)
    scored = unigram_logprob(corpus)
    med = scored.approxQuantile("logprob", [0.5], 0.0)[0]
    wd, out = str(tmp_path / "wd"), str(tmp_path / "enc")
    reports = run_pipeline(
        spark,
        corpus_path,
        wd,
        out,
        stages=["score", "encode"],
        min_logprob=med,
        num_partitions=4,
    )
    by = {r["stage"]: r for r in reports}
    expected = scored.filter(F.col("logprob") >= med).count()
    assert by["score"]["rows"] == expected


def test_neardup_stage_drops_pair_losers(spark, tmp_path):
    rng = np.random.default_rng(23)
    base = [int(v) for v in rng.integers(0, 3000, size=400)]
    rows = []
    for i in range(60):
        toks = [int(v) for v in rng.integers(0, 3000, size=400)]
        rows.append((str(i), toks, "src0"))
    # docs 100/101 are near-copies of doc 90 (tail edits, >>85% trigram overlap)
    rows.append(("90", base, "src0"))
    rows.append(("100", base[:-5] + [int(v) for v in rng.integers(0, 3000, size=5)], "src0"))
    rows.append(("101", base[:-3] + [int(v) for v in rng.integers(0, 3000, size=3)], "src0"))
    src = str(tmp_path / "ndsrc")
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).withColumn("n_tok", F.size("tokens").cast("int")).write.mode("overwrite").parquet(src)
    wd, out = str(tmp_path / "wd"), str(tmp_path / "enc")
    reports = run_pipeline(
        spark, src, wd, out,
        stages=["neardup", "encode"], neardup_threshold_pct=85, num_partitions=4,
    )
    by = {r["stage"]: r for r in reports}
    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(by["neardup"]["output"]).select("doc_id").collect()
    }
    # pair losers (the larger id of each verified pair) dropped; canonical kept
    assert "90" in survivors
    assert not {"100", "101"} & survivors
    assert by["neardup"]["rows"] == 61


def test_guards_fail_loud(spark, corpus_path, tmp_path):
    wd, out = str(tmp_path / "wd"), str(tmp_path / "enc")
    # container has no packed (multi-column) encode path
    with pytest.raises(ValueError, match="container"):
        run_pipeline(spark, corpus_path, wd, out,
                     stages=["pack", "encode"], container="zlib")
    # resume machinery is driver-local file IO
    with pytest.raises(ValueError, match="driver-visible"):
        run_pipeline(spark, corpus_path, "s3://bucket/wd", out,
                     stages=["clean", "encode"])
    # non-long-castable ids would silently drop out of the minhash kernels
    bad = str(tmp_path / "badids")
    spark.read.parquet(corpus_path).withColumn(
        "doc_id", F.concat(F.lit("uuid-"), F.col("doc_id"))
    ).write.mode("overwrite").parquet(bad)
    with pytest.raises(ValueError, match="castable to BIGINT"):
        run_pipeline(spark, bad, wd, out, stages=["neardup", "encode"])


def test_shards_terminal_stage(spark, corpus_path, tmp_path):
    from gorilla_stream_spark.packing import shard_manifest

    wd, out = str(tmp_path / "wd"), str(tmp_path / "shards")
    reports = run_pipeline(
        spark, corpus_path, wd, out,
        stages=["clean", "dedup", "pack", "shards"],
        seq_len=64, seqs_per_shard=4,
    )
    by = {r["stage"]: r for r in reports}
    man = shard_manifest(spark, out).collect()
    assert sum(r["n_seqs"] for r in man) == by["pack"]["rows"]
    assert all(r["n_seqs"] <= 4 for r in man)
    # resume: identical re-run skips everything including the shard write
    r2 = run_pipeline(
        spark, corpus_path, wd, out,
        stages=["clean", "dedup", "pack", "shards"],
        seq_len=64, seqs_per_shard=4,
    )
    assert all(r["skipped"] for r in r2)
    # shards and encode are alternative terminals
    with pytest.raises(ValueError, match="alternative terminals"):
        run_pipeline(spark, corpus_path, wd, out,
                     stages=["pack", "shards", "encode"])
    with pytest.raises(ValueError, match="requires the pack stage"):
        run_pipeline(spark, corpus_path, wd, out, stages=["clean", "shards"])

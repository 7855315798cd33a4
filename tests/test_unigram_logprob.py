"""Unigram log-probability scoring: numpy parity, smoothing/OOV floor,
vocab-cap behavior, empty docs, layout invariance, and plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.vocab import token_counts, unigram_logprob


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(13)
    rows = [
        (
            f"d{i:03d}",
            [int(v) for v in rng.integers(0, 200, size=int(rng.integers(5, 60)))],
        )
        for i in range(120)
    ] + [("dempty", [])]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>").cache()


def _numpy_oracle(rows, alpha=1.0):
    from collections import Counter

    cnt = Counter(t for _, toks in rows for t in toks)
    n = sum(cnt.values())
    v = len(cnt)
    denom = n + alpha * (v + 1)
    out = {}
    for d, toks in rows:
        if not toks:
            out[d] = (0, 0, 0.0)
            continue
        sc = sum(cnt[t] for t in toks)
        lp = sum(math.log2((cnt[t] + alpha) / denom) for t in toks) / len(toks)
        out[d] = (len(toks), sc, lp)
    return out


def test_matches_numpy_oracle(spark, corpus):
    got = {
        r["doc_id"]: (r["n_tok"], r["sum_cnt"], r["logprob"])
        for r in unigram_logprob(corpus).collect()
    }
    rows = [(r["doc_id"], r["tokens"]) for r in corpus.collect()]
    exp = _numpy_oracle(rows)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0] and got[d][1] == exp[d][1], d
        assert got[d][2] == pytest.approx(exp[d][2], rel=1e-12), d


def test_empty_doc_scores_zero(spark, corpus):
    r = unigram_logprob(corpus).filter(F.col("doc_id") == "dempty").first()
    assert r["n_tok"] == 0 and r["sum_cnt"] == 0 and r["logprob"] == 0.0


def test_vocab_cap_oov_floor(spark, corpus):
    # cap the broadcast to the 10 most frequent tokens: every other token
    # falls to the OOV floor, so capped scores are <= uncapped everywhere
    full = {r["doc_id"]: r["logprob"] for r in unigram_logprob(corpus).collect()}
    capped = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob(corpus, max_vocab=10).collect()
    }
    assert all(capped[d] <= full[d] + 1e-12 for d in full)
    assert any(capped[d] < full[d] - 1e-9 for d in full)


def test_layout_invariance(spark, corpus):
    a = {r["doc_id"]: r["logprob"] for r in unigram_logprob(corpus).collect()}
    shuffled = corpus.orderBy(F.rand(3)).repartition(7)
    b = {r["doc_id"]: r["logprob"] for r in unigram_logprob(shuffled).collect()}
    assert a == b


def test_precomputed_counts_reused(spark, corpus):
    cnts = token_counts(corpus)
    a = {r["doc_id"]: r["logprob"] for r in unigram_logprob(corpus).collect()}
    b = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob(corpus, counts=cnts).collect()
    }
    assert a == b


def test_scoring_plan_map_only(spark, corpus):
    # with precomputed counts the scoring pass itself must be map-only:
    # no Exchange, no join — one Arrow kernel over the corpus scan
    cnts = token_counts(corpus)
    out = unigram_logprob(corpus, counts=cnts)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInArrow") + plan.count("mapInArrow") == 1

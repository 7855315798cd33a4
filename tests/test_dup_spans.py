"""Exact substring-duplication spans (duplicate_spans / strip_duplicate_spans):
planted verbatim spans, keep-first canonical copy, span merging, anchored
windows vs off-phase copies, and the single-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gorilla_stream_spark.textops import duplicate_spans, strip_duplicate_spans

K = 5


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


@pytest.fixture(scope="module")
def corpus(spark):
    """80 random docs; a 20-token verbatim span planted into three of them
    at different offsets; one doc with an internal repeat."""
    rng = np.random.default_rng(7)
    span = [int(v) for v in rng.integers(1000, 2000, size=20)]
    rows = []
    for i in range(80):
        n = int(rng.integers(30, 90))
        toks = [int(v) for v in rng.integers(0, 500, size=n)]
        rows.append([f"d{i:03d}", toks])
    rows[3][1] = rows[3][1][:10] + span + rows[3][1][10:]
    rows[17][1] = rows[17][1][:4] + span + rows[17][1][4:]
    rows[42][1] = span + rows[42][1]
    rows[60][1] = rows[60][1][:5] + span[:8] + rows[60][1][5:10] + span[:8]
    return _mkdf(spark, [tuple(r) for r in rows])


def test_planted_span_found(corpus):
    res = {r["doc_id"]: r for r in duplicate_spans(corpus, k=K).collect()}
    for d in ("d003", "d017", "d042"):
        assert d in res, f"planted span not found in {d}"
        assert res[d]["dup_tokens"] >= 20
    # the internal repeat (8-token span twice within d060) is also caught
    assert "d060" in res
    assert res["d060"]["dup_tokens"] >= 16


def test_no_false_positives(spark):
    rng = np.random.default_rng(11)
    # unique random docs over a huge vocab: no k-window repeats
    rows = [
        (f"u{i}", [int(v) for v in rng.integers(0, 2**31 - 1, size=40)])
        for i in range(50)
    ]
    assert duplicate_spans(_mkdf(spark, rows), k=K).count() == 0


def test_span_positions_exact(spark):
    span = list(range(100, 120))
    a = list(range(10)) + span + list(range(30, 40))
    b = list(range(50, 57)) + span + list(range(70, 73))
    res = {
        r["doc_id"]: r
        for r in duplicate_spans(_mkdf(spark, [("a", a), ("b", b)]), k=K).collect()
    }
    assert [(s["s"], s["e"]) for s in res["a"]["spans"]] == [(10, 30)]
    assert [(s["s"], s["e"]) for s in res["b"]["spans"]] == [(7, 27)]
    assert res["a"]["n_dup_windows"] == 20 - K + 1


def test_keep_first_and_strip(spark):
    span = list(range(100, 120))
    a = list(range(10)) + span + list(range(30, 40))
    b = list(range(50, 57)) + span + list(range(70, 73))
    df = _mkdf(spark, [("a", a), ("b", b)])
    sp = duplicate_spans(df, k=K, keep_first=True)
    res = {r["doc_id"]: r for r in sp.collect()}
    # canonical (min (doc_id, pos)) occurrence lives in "a": only b marked
    assert list(res) == ["b"]
    clean = {
        r["doc_id"]: r["tokens"]
        for r in strip_duplicate_spans(df, sp).collect()
    }
    assert clean["a"] == a  # untouched
    assert clean["b"] == list(range(50, 57)) + list(range(70, 73))
    # docs without spans keep extra columns on passthrough
    df2 = df.withColumn("n", F.size("tokens"))
    out = strip_duplicate_spans(df2, sp)
    assert set(out.columns) == {"doc_id", "tokens", "n"}


def test_short_docs_and_empty(spark):
    df = _mkdf(spark, [("a", [1, 2]), ("b", []), ("c", [5] * 3)])
    assert duplicate_spans(df, k=5).count() == 0


def test_merge_adjacent_islands(spark):
    # two shared spans separated by a gap > k stay two spans
    s1, s2 = list(range(200, 210)), list(range(300, 310))
    a = s1 + list(range(400, 420)) + s2
    b = s1 + list(range(500, 525)) + s2
    res = {r["doc_id"]: r for r in duplicate_spans(_mkdf(spark, [("a", a), ("b", b)]), k=K).collect()}
    assert res["a"]["n_spans"] == 2
    assert res["a"]["dup_tokens"] == 20


def test_anchored_catches_offphase(spark):
    """Fixed stride misses copies at different phase; anchored windows
    (content-defined positions) still collide."""
    rng = np.random.default_rng(3)
    span = [int(v) for v in rng.integers(5000, 9000, size=60)]
    a = [int(v) for v in rng.integers(0, 500, size=32)] + span
    b = [int(v) for v in rng.integers(0, 500, size=37)] + span  # phase differs mod 4
    df = _mkdf(spark, [("a", a), ("b", b)])
    anch = duplicate_spans(df, k=8, stride=4, anchored=True)
    assert anch.count() == 2
    # exact mode agrees on the covered region (anchored is a subset)
    exact = {r["doc_id"]: r for r in duplicate_spans(df, k=8).collect()}
    got = {r["doc_id"]: r for r in anch.collect()}
    for d in ("a", "b"):
        (es, ee) = exact[d]["spans"][0]["s"], exact[d]["spans"][0]["e"]
        for sp in got[d]["spans"]:
            assert sp["s"] >= es and sp["e"] <= ee


def test_plan_narrow_count_shuffle(corpus):
    """Plan gate for the two-pass shape: the result's lineage is a map-only
    kernel (dup hashes ride a task broadcast, matched by searchsorted) plus
    the doc-level regroup — no join of the window table, no Sort, and the
    only shuffle keys on __sd_id.  (Pass 1, the 16-byte (wh, cnt) count
    aggregation, runs eagerly inside the call and is not in this plan.)"""
    import re

    res = duplicate_spans(corpus, k=K)
    plan = res._jdf.queryExecution().executedPlan().toString()
    keys = {m.group(1) for m in re.finditer(r"hashpartitioning\((\w+)#", plan)}
    assert keys <= {"__sd_id"}, keys
    assert "Join" not in plan  # dup hashes attach inside the kernel
    # the window table is never sorted (the old Window-function shape paid
    # an O(W log W) sort under the wh Exchange)
    assert not re.search(r"Sort \[wh", plan)


def test_bad_params(corpus):
    with pytest.raises(ValueError):
        duplicate_spans(corpus, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(corpus, min_count=1)

"""Timeseries validator: gap analysis + quality score (reference parity)."""

from __future__ import annotations

import math

from gorilla_stream_spark.validate import validate_timeseries


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts long, value double")


def test_clean_regular_series_scores_100(spark):
    df = _df(spark, [(i * 10, 1.5) for i in range(50)])
    r = validate_timeseries(df).first()
    assert r.quality_pct == 100
    assert not r.significant_gaps and not r.duplicate_timestamps
    assert r.n_valid == r.n_points == 50


def test_gap_detection_integer_exact(spark):
    # 30 deltas of 10 + 4 deltas of 1000 -> large gaps > 10% of deltas
    ts, t = [], 0
    for i in range(35):
        ts.append(t)
        t += 1000 if i % 8 == 7 else 10
    df = _df(spark, [(x, 1.0) for x in ts])
    r = validate_timeseries(df).first()
    assert r.large_gaps == 4
    assert r.significant_gaps
    assert r.quality_pct == 90  # one issue -> -10


def test_duplicates_nan_inf_penalties(spark):
    rows = [(0, 1.0), (0, 1.0), (10, float("nan")), (20, float("inf")), (-5, 2.0)]
    r = validate_timeseries(_df(spark, rows)).first()
    assert r.duplicate_timestamps
    assert r.nan_count == 1 and r.inf_count == 1
    # valid = 2/5 -> 40; issues: dups, nan, inf, invalid points -> -40
    assert r.quality_pct == 0


def test_per_series_rows(spark):
    rows = [(u, i * 10, 1.0) for u in range(3) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = validate_timeseries(df, series_col="user_id").collect()
    assert len(out) == 3
    assert all(r.quality_pct == 100 for r in out)


def test_validate_vectors_flags_and_clean(spark):
    from gorilla_stream_spark.validate import validate_vectors

    rows = [
        (1, [0.1, 0.2]),
        (2, [float("nan"), 0.1]),
        (3, []),
        (4, [0.1, 0.2, 0.3]),
        (5, [2000.0, 0.0]),
        (6, [float("inf"), 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.issue for r in validate_vectors(df, expect_dim=2, max_abs=1000).collect()}
    assert got == {
        2: "nan_component",
        3: "empty_vector",
        4: "dim_mismatch",
        5: "component_out_of_range",
        6: "inf_component",
    }
    # clean table -> empty report
    clean = df.filter(df.vec_id == 1)
    assert validate_vectors(clean, expect_dim=2, max_abs=1000).count() == 0


def test_token_stats_matches_manual(spark):
    from gorilla_stream_spark.textops import token_stats

    rows = [("a", [3, 1, 3, 2]), ("b", [7]), ("c", [])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r.doc_id: r for r in token_stats(df).collect()}
    assert set(got) == {"a", "b"}  # empty arrays excluded
    a = got["a"]
    assert (a.n_tok, a.n_distinct_tok, a.min_tok, a.max_tok, a.sum_tok) == (4, 3, 1, 3, 9)
    b = got["b"]
    assert (b.n_tok, b.n_distinct_tok, b.min_tok, b.max_tok, b.sum_tok) == (1, 1, 7, 7, 7)

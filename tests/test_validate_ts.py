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

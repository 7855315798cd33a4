"""Data-pattern analysis + configuration recommendation.

Analog of ``GorillaStream.Config.analyze_and_recommend/2``
(``/root/reference/lib/gorilla_stream/config.ex:26-172``): the reference
samples the stream, scores timestamp regularity / value stability, and
recommends chunk size, zlib use, and concurrency.  Here the same role is
played by one aggregate over the table (doc/token counts, length skew) plus
a sampled codec-selector pass (`estimate`) — the output recommends
partition count, block size, codec expectations, and flags length skew that
the salted repartition must absorb.

All driver-side numbers come from Spark aggregates; nothing is collected
beyond one row per codec.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gorilla_stream_spark.engine import DEFAULT_BLOCK_TOKENS, estimate

__all__ = ["analyze_and_recommend"]

# ~32M tokens (~128 MB raw int32) per partition keeps task runtime in the
# sweet spot (seconds, not minutes) and bounds executor memory
TARGET_TOKENS_PER_PARTITION = 32 * 1024 * 1024


def analyze_and_recommend(
    df: DataFrame,
    sample_fraction: float | None = None,
    block_tokens: int = DEFAULT_BLOCK_TOKENS,
) -> dict:
    """Analyze a tokens table and recommend engine configuration.

    Returns a plain dict (JSON-able, mirrors the reference's keyword-list
    return): corpus stats, skew indicators, recommended partitions/block
    size, and the expected codec mix + compression ratio from a sampled
    selector pass.
    """
    stats = df.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.avg("n_tok").alias("avg_tok"),
        F.max("n_tok").alias("max_tok"),
        F.expr("percentile_approx(n_tok, 0.5)").alias("p50_tok"),
        F.expr("percentile_approx(n_tok, 0.99)").alias("p99_tok"),
    ).first()
    n_docs = stats["n_docs"] or 0
    total = stats["total_tokens"] or 0
    if n_docs == 0:
        return {"n_docs": 0, "recommended_partitions": 1, "block_tokens": block_tokens}

    if sample_fraction is None:
        # aim at ~64 blocks of selector work regardless of table size
        sample_fraction = min(1.0, 64 * block_tokens / max(total, 1))
    sample = df.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else df

    def _codec_mix(src: DataFrame) -> list:
        return (
            estimate(src, block_tokens=block_tokens)
            .groupBy("codec")
            .agg(
                F.count("*").alias("blocks"),
                F.sum("raw_bytes").alias("raw"),
                F.sum("est_bytes").alias("est"),
            )
            .collect()
        )

    est = _codec_mix(sample)
    if not est:
        # a tiny fraction on a huge table can sample zero rows; a bounded
        # limit() sample beats silently reporting "compresses to nothing"
        est = _codec_mix(df.limit(4096))
    raw = sum(r["raw"] for r in est) or 1
    enc = sum(r["est"] for r in est)

    p99 = stats["p99_tok"] or 1
    p50 = stats["p50_tok"] or 1
    skew = p99 / max(p50, 1)
    return {
        "n_docs": int(n_docs),
        "total_tokens": int(total),
        # all-NULL n_tok leaves the aggregates None even with rows present
        # (pre-backfill tables); report zeros instead of crashing the tool
        # whose job is to flag exactly that
        "avg_tokens_per_doc": round(float(stats["avg_tok"] or 0), 1),
        "p50_tokens": int(p50),
        "p99_tokens": int(p99),
        "max_tokens": int(stats["max_tok"] or 0),
        "length_skew_p99_over_p50": round(skew, 2),
        # the salted repartition absorbs doc-level skew; flag it so operators
        # know why the explicit shuffle exists (north rule)
        "skew_handling": "salted_repartition" if skew > 4 else "uniform_enough",
        "recommended_partitions": max(1, math.ceil(total / TARGET_TOKENS_PER_PARTITION)),
        "block_tokens": block_tokens,
        "expected_codec_mix": {r["codec"]: int(r["blocks"]) for r in est},
        "expected_ratio": round(enc / raw, 4),
        "sample_fraction": round(sample_fraction, 6),
    }

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

    # vocabulary shape from the same sample (partial-agg kernel, no explode):
    # a dense global-dict remap pays when rank width beats raw value width
    from gorilla_stream_spark.vocab import DEFAULT_MAX_VOCAB, token_counts

    vc = token_counts(sample).agg(
        F.count("*").alias("v"),
        F.min("token").alias("lo"),
        F.max("token").alias("hi"),
    ).first()
    vocab = int(vc["v"] or 0)
    t_range = int(vc["hi"] - vc["lo"] + 1) if vocab else 0
    w_range = max(t_range - 1, 0).bit_length()
    w_dict = max(vocab - 1, 0).bit_length()
    dict_saves = max(w_range - w_dict, 0)

    # layout hint: a mixed codec mix across >1 source means content
    # families are interleaved — similarity clustering makes blocks
    # homogeneous; single-family tables keep the salted throughput layout
    n_sources = (
        df.agg(F.count_distinct("source")).first()[0] if "source" in df.columns else 1
    )

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
        "sampled_vocab": vocab,
        "sampled_token_range": t_range,
        # >= 2 packed bits per token saved before it beats the remap cost
        "global_dict_saves_bits": dict_saves,
        "recommend_global_dict": dict_saves >= 2 and vocab <= DEFAULT_MAX_VOCAB,
        "layout_hint": (
            "cluster_for_compression"
            if n_sources > 1 and len(est) > 1
            else "salted_repartition"
        ),
    }

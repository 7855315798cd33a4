"""Explicit salted repartitioning for sequence-length skew.

The reference has no skew story (uniform 5,000-point chunks,
``/root/reference/lib/gorilla_stream/stream.ex:70-86``); the north rule
demands one because pre-tokenized training corpora have long-tail ``n_tok``
(lognormal, heavy tail).  Strategy:

* deterministic partition assignment by ``xxhash64(doc_id)`` — resume-safe
  lineage (same doc -> same partition on every run, regardless of input
  split order), and hash-uniform so long docs scatter instead of clumping;
* downstream, the engine re-chunks each partition into ~equal-token blocks,
  so one hot partition cannot produce one giant Arrow batch.

``skew_stats`` measures the before/after partition token histogram — the
evidence the plan would hold at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition", "skew_stats", "cluster_for_compression"]


def salted_repartition(
    df: DataFrame,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    sort_within: bool = True,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition by a deterministic salt of the doc id.

    ``repartition(P, xxhash64(id))`` gives one shuffle whose keys are
    uniform regardless of how skewed ``n_tok`` or the input layout is.
    The full 64-bit hash (not ``hash % P``) is the partition expression:
    pre-bucketing to P values and re-hashing them would collide for small P
    and leave partitions empty.  Sorting within partitions by id makes
    downstream block formation deterministic (required for idempotent
    checkpoint resume).
    """
    P = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    salted = df.repartition(P, F.xxhash64(F.col(id_col)))
    if not sort_within:
        return salted
    return salted.sortWithinPartitions(*(sort_cols or [id_col]))


def cluster_for_compression(
    df: DataFrame,
    by: tuple[str, ...] = ("source",),
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    prefix_tokens: int = 16,
) -> DataFrame:
    """Similarity-ordered layout: co-locate alike rows before encoding.

    The encode path's salted layout optimizes for SKEW (uniform partition
    load); this optimizes for RATIO: range-partition + sort by
    ``(by..., first prefix_tokens of the token array, id)`` so rows with
    shared provenance and shared content prefixes become block neighbors.
    Homogeneous blocks shrink twice over — the per-block codec sees a
    narrower value range / longer runs (FOR width, RLE runs, dict
    cardinality are all per-block), and the zstd/zlib containers find
    cross-doc matches inside the block window.  This is the classic
    row-reordering-for-compression lever from columnar warehouses (the
    same reason Parquet writers sort before writing); the reference cannot
    express it — its unit is a single stream.

    One range shuffle total.  Feed the result to ``encode(...,
    repartition=False)`` to preserve the layout (the default salted
    repartition would destroy it).  Trade-off vs ``salted_repartition``:
    range partitioning balances ROW counts, not token counts — for
    heavy-tail corpora keep the salted path for throughput and use this
    when storage ratio is the target (cold tiers, archives).

    Decode equality is unaffected (clustering permutes rows, the engine's
    round-trip contract is per-doc) — asserted by the q60 driver oracle.

    When it does NOT pay: the salted encode path already sorts WITHIN each
    partition by ``(source, id)``, so if partitions are much larger than
    blocks the per-partition sort delivers most of the homogeneity and this
    global reorder adds little (bench q4e records ~0 delta on the mixed
    strata corpus for exactly that reason).  The win case is content
    families INTERLEAVED across the grouping columns' sort order — prefix
    clustering groups what the group-column sort cannot (ratio-gain
    pytest).  Measure with ``analyze_and_recommend``'s ``layout_hint``
    before paying the range shuffle.
    """
    P = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in by]
    if prefix_tokens:
        # arrays order lexicographically in Spark; the slice bounds the
        # sort-key width so the range exchange never ships whole documents
        # twice
        keys.append(F.expr(f"slice({tokens_col}, 1, {int(prefix_tokens)})"))
    keys.append(F.col(id_col))
    return df.repartitionByRange(P, *keys).sortWithinPartitions(*keys)


def skew_stats(df: DataFrame, size_col: str = "n_tok") -> DataFrame:
    """Per-partition token-count totals (skew evidence for BENCH/)."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count("*").alias("rows"),
            F.sum(size_col).alias("tokens"),
            F.max(size_col).alias("max_doc"),
        )
        .orderBy("__pid")
    )

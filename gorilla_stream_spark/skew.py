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

__all__ = ["salted_repartition", "skew_stats"]


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

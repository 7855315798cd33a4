"""Deterministic synthetic tokens-table generator (FIXTURES.md).

Analog of the reference's seeded realistic-data profiles
(``/root/reference/lib/gorilla_stream/performance/realistic_data.ex:12-60``):
each ``source`` stratum exercises one codec trigger.  Fully deterministic
given (seed, n_docs) — required so checkpoint-resume and re-runs produce
bit-identical buffers.

Generation is pure numpy on the driver for small scales; ``tokens_df``
distributes generation across executors via ``mapInPandas`` over a range —
each doc's tokens derive only from its global index, so the table is
identical at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["STRATA", "gen_doc", "tokens_pdf", "tokens_df"]

STRATA = [
    "constant",
    "runs",
    "small_vocab",
    "zipf_vocab",
    "sorted_ids",
    "narrow_range",
    "counter",
    "random",
    "skewed_len",
]

TOKENS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

_VOCAB_GPT2 = 50257
_MAX31 = 2**31 - 2


def gen_doc(i: int, seed: int = 42) -> tuple[str, np.ndarray, str]:
    """Deterministic doc #i: (doc_id, tokens int32, source)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    source = STRATA[i % len(STRATA)]
    if source == "skewed_len":
        n = int(min(np.exp(rng.normal(6.0, 1.5)), 32768)) + 1
    else:
        n = int(rng.integers(64, 2048))
    # edge rows mixed in (FIXTURES.md): tiny docs
    if i % 97 == 0:
        n = int(rng.integers(1, 3))
    if source == "constant":
        toks = np.full(n, rng.integers(0, _VOCAB_GPT2), dtype=np.int64)
    elif source == "runs":
        n_runs = max(1, rng.binomial(n, 0.02))
        vals = rng.integers(0, _VOCAB_GPT2, n_runs)
        lens = rng.multinomial(n - n_runs, np.ones(n_runs) / n_runs) + 1
        toks = np.repeat(vals, lens)
    elif source == "small_vocab":
        toks = np.minimum(rng.zipf(1.2, n) - 1, 255)
    elif source == "zipf_vocab":
        toks = np.minimum(rng.zipf(1.1, n) - 1, _VOCAB_GPT2 - 1)
    elif source == "sorted_ids":
        toks = np.cumsum(rng.integers(0, 8, n))
    elif source == "narrow_range":
        toks = rng.integers(1000, 1256, n)
    elif source == "counter":
        toks = np.cumsum(rng.integers(1, 50, n))
    elif source == "random":
        toks = rng.integers(0, _MAX31, n)
    else:  # skewed_len: mixed content
        toks = np.minimum(rng.zipf(1.3, n) - 1, _VOCAB_GPT2 - 1)
    return f"doc{i:08d}", np.asarray(toks, dtype=np.int32), source


def tokens_pdf(n_docs: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    rows = [gen_doc(i, seed) for i in range(start, start + n_docs)]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": np.array([r[1].size for r in rows], dtype=np.int32),
            "source": [r[2] for r in rows],
        }
    )


def tokens_df(spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: identical at any parallelism."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    idx = spark.range(0, n_docs, 1, P).select(F.col("id").cast("long"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [gen_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "tokens": [r[1] for r in rows],
                    "n_tok": np.array([r[1].size for r in rows], dtype=np.int32),
                    "source": [r[2] for r in rows],
                }
            )

    return idx.mapInPandas(fn, TOKENS_SCHEMA)

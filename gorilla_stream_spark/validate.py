"""Input validation and cleaning for token tables.

Analog of ``GorillaStream.Validator``
(``/root/reference/lib/gorilla_stream/validator.ex:24-203``): per-point
checks (the reference flags negative timestamps, NaN/Inf values, ordering,
duplicates, gaps), here re-expressed as declarative DataFrame predicates so
Catalyst pushes them into the scan — no UDFs.

Checks on (doc_id, tokens, n_tok, source):
  * doc_id non-null / non-duplicate
  * tokens non-null, n_tok == size(tokens)  (count invariant — the analog
    of the reference's ts/value count equality, encoder/bit_packing.ex:30-36)
  * token values within [0, max_token]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate", "clean"]

MAX_TOKEN = (1 << 32) - 2  # fsst pair-packing bound


def _issue_col(max_token: int):
    return (
        F.when(F.col("doc_id").isNull(), "null_doc_id")
        .when(F.col("tokens").isNull(), "null_tokens")
        .when(F.col("n_tok") != F.size("tokens"), "n_tok_mismatch")
        .when(F.exists("tokens", lambda t: t.isNull()), "null_token")
        .when(
            F.exists("tokens", lambda t: (t < F.lit(0)) | (t > F.lit(max_token))),
            "token_out_of_range",
        )
        .otherwise(None)
    )


def validate(df: DataFrame, max_token: int = MAX_TOKEN) -> DataFrame:
    """Row-level quality report: (doc_id, issue) for every offending row,
    plus duplicate doc_ids.  Empty result == valid dataset."""
    issues = (
        df.withColumn("issue", _issue_col(max_token))
        .filter(F.col("issue").isNotNull())
        .select("doc_id", "issue")
    )
    dupes = (
        df.groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .select("doc_id", F.lit("duplicate_doc_id").alias("issue"))
    )
    return issues.unionByName(dupes)


def clean(df: DataFrame, max_token: int = MAX_TOKEN) -> DataFrame:
    """Filter to valid rows, fix n_tok, and drop duplicate doc_ids —
    analog of ``Validator.clean/2`` (validator.ex:67-90: filter + sort +
    dedupe)."""
    return (
        df.filter(F.col("doc_id").isNotNull() & F.col("tokens").isNotNull())
        .filter(~F.exists("tokens", lambda t: t.isNull() | (t < F.lit(0)) | (t > F.lit(max_token))))
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .dropDuplicates(["doc_id"])
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: encode sf0.001 documents-derived tokens with
codec auto-selection, return the per-codec manifest rollup.

``queries()`` / ``oracle_sql()`` — one entry per operator from SURVEY.md §2:

* round-trip queries run the real encode->decode->compare pipeline in Spark
  and output (doc_id, ok); the oracle asserts every doc present and ok=TRUE
  — a mismatch or lost/duplicated doc breaks count or value hash.
* codec-stage queries (delta, delta-of-delta, zigzag, RLE run stats,
  frame-of-reference residuals, dict codes, counter-undelta, selector
  features) are expressed both in Spark and ANSI SQL — strong value oracles.
* bit-level-only operators (estimate, skew stats, manifest sizes) have no
  SQL form -> rows-only checks (documented weaker gate).

Tokens are derived deterministically from ``documents.text`` (one token per
character, ascii code) so the Spark side and the DuckDB oracle agree on the
doc population without shipping data between them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _epoch_us():
    # events.ts is TIMESTAMP_NTZ; timestampdiff from the epoch is timezone-
    # independent and matches DuckDB's epoch_us(ts) exactly.  Built lazily:
    # F.expr needs an active SparkContext.
    return F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")


def _tokens_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr("transform(split(text,''), c -> ascii(c))").cast("array<int>").alias("tokens"),
            F.col("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


def _roundtrip(codec: str, container: str = "none"):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from gorilla_stream_spark import decode, encode

        src = _tokens_from_documents(spark, sf_dir)
        enc = encode(src, codec=codec, num_partitions=4, container=container)
        dec = decode(enc)
        return (
            src.alias("s")
            .join(dec.alias("d"), "doc_id", "inner")
            .select(
                "doc_id",
                (F.col("s.tokens") == F.col("d.tokens")).alias("ok"),
            )
        )

    return run


def q_manifest_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark import encode

    enc = encode(_tokens_from_documents(spark, sf_dir), codec="auto", num_partitions=4)
    return enc.agg(
        F.sum("n_docs").cast("long").alias("n_docs_total"),
        F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        F.sum("raw_bytes").cast("long").alias("raw_bytes_total"),
    )


def q_delta_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        (_epoch_us() - F.lag(_epoch_us()).over(w)).alias("delta_us"),
    )


def q_dod_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.select(
        "event_id",
        "user_id",
        (_epoch_us() - F.lag(_epoch_us()).over(w)).alias("delta_us"),
    )
    return d.select(
        "event_id",
        (F.col("delta_us") - F.lag("delta_us").over(w)).alias("dod_us"),
    )


def q_zigzag_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.select(
        "event_id", (_epoch_us() - F.lag(_epoch_us()).over(w)).alias("delta_us")
    )
    return d.select(
        "event_id",
        F.when(F.col("delta_us") >= 0, 2 * F.col("delta_us"))
        .otherwise(-2 * F.col("delta_us") - 1)
        .alias("zz"),
    )


def q_rle_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-length segmentation over a totally-ordered key (o_orderkey is
    # unique; lineitem's (orderkey, linenumber) has ties -> nondeterministic)
    from pyspark.sql.window import Window

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    runs = od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).select(
        "o_custkey",
        "o_orderstatus",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("run_id"),
    )
    return runs.groupBy("o_custkey", "run_id", "o_orderstatus").agg(
        F.count("*").cast("long").alias("run_len")
    )


def q_for_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    w = Window.partitionBy("p_brand")
    return pt.select(
        "p_partkey",
        (F.col("p_retailprice") - F.min("p_retailprice").over(w)).alias("resid"),
    )


def q_dict_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.orderBy("event_type")
    return ev.select(
        "event_id", "event_type", (F.dense_rank().over(w) - 1).cast("long").alias("code")
    )


def q_selector_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


def q_counter_undelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.sum("n_chars").over(w).cast("long").alias("running_chars"),
    )


def q_timeseries_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        _epoch_us().alias("ts"), F.col("value")
    )
    dec = decode_timeseries(encode_timeseries(ev, num_partitions=4))
    # sum of epoch-us overflows int64 at ~10k rows; sum milliseconds instead
    return dec.agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.expr("ts div 1000")).cast("long").alias("sum_ts_ms"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark import clean

    src = _tokens_from_documents(spark, sf_dir)
    dirty = src.unionByName(src.limit(7))  # inject duplicate doc_ids
    return clean(dirty).groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))


def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark import validate

    src = _tokens_from_documents(spark, sf_dir)
    dirty = src.unionByName(src.limit(5))
    return validate(dirty).groupBy("issue").agg(F.count("*").cast("long").alias("n"))


# --- rows-only operators (no SQL form; driver records weaker check) --------


def q_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark import estimate

    return estimate(_tokens_from_documents(spark, sf_dir))


def q_codec_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark import encode

    enc = encode(_tokens_from_documents(spark, sf_dir), codec="auto", num_partitions=4)
    return enc.groupBy("codec").agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("enc_bytes").alias("enc_bytes"),
    )


def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gorilla_stream_spark.skew import salted_repartition, skew_stats

    return skew_stats(salted_repartition(_tokens_from_documents(spark, sf_dir), num_partitions=4))


def q_scaledf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2-decimal prices -> scaledf (VictoriaMetrics-style decimal scaling)
    # must reconstruct values exactly; aggregate checked against source SQL
    from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("ts"),
        F.col("l_extendedprice").alias("value"),
    )
    dec = decode_timeseries(encode_timeseries(li, num_partitions=4))
    # integer-cent sum: float addition is order-dependent across engines
    return dec.agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("sum_cents"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def q_xorlag_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # periodic float series -> lagged-XOR codec; exact reconstruction checked
    # via sum/min/max of the decoded stream against SQL recomputation
    from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("long").alias("ts"),
        F.round(F.sin(F.col("event_id") % 24 / 24 * 6.283185307179586), 6).alias("value"),
    )
    dec = decode_timeseries(encode_timeseries(ev, num_partitions=4))
    # integer micro-unit sum: float addition is order-dependent across engines
    return dec.agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).cast("long").alias("sum_micro"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def q_timerange_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # manifest-pruned time-range read: only blocks overlapping the range are
    # decoded (Iceberg min/max-stats pattern on codec blocks)
    from gorilla_stream_spark import read_timerange
    from gorilla_stream_spark.engine import encode_timeseries

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        _epoch_us().alias("ts"), F.col("value")
    )
    lo_hi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo = lo_hi["lo"] + (lo_hi["hi"] - lo_hi["lo"]) // 4
    hi = lo_hi["lo"] + (lo_hi["hi"] - lo_hi["lo"]) // 2
    enc = encode_timeseries(ev, num_partitions=8)
    out = read_timerange(enc, lo, hi)
    return out.agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.expr("ts div 1000")).cast("long").alias("sum_ts_ms"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_codec_mix(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_roundtrip_auto": _roundtrip("auto"),
        "q02_roundtrip_raw": _roundtrip("raw"),
        "q03_roundtrip_for": _roundtrip("for"),
        "q04_roundtrip_rle": _roundtrip("rle"),
        "q05_roundtrip_dict": _roundtrip("dict"),
        "q06_roundtrip_delta": _roundtrip("delta"),
        "q07_roundtrip_dod": _roundtrip("dod"),
        "q08_roundtrip_fsst": _roundtrip("fsst"),
        "q09_manifest_counts": q_manifest_counts,
        "q10_delta_stage": q_delta_stage,
        "q11_dod_stage": q_dod_stage,
        "q12_zigzag_stage": q_zigzag_stage,
        "q13_rle_runs": q_rle_runs,
        "q14_for_stage": q_for_stage,
        "q15_dict_stage": q_dict_stage,
        "q16_selector_features": q_selector_features,
        "q17_counter_undelta": q_counter_undelta,
        "q18_timeseries_roundtrip": q_timeseries_roundtrip,
        "q19_clean": q_clean,
        "q20_validate": q_validate,
        "q21_estimate": q_estimate,
        "q22_codec_mix": q_codec_mix,
        "q23_skew_stats": q_skew_stats,
        "q24_roundtrip_container": _roundtrip("auto", container="auto"),
        "q25_scaledf_roundtrip": q_scaledf_roundtrip,
        "q26_xorlag_roundtrip": q_xorlag_roundtrip,
        "q27_timerange_read": q_timerange_read,
        "q28_roundtrip_forc": _roundtrip("forc"),
    }


_ROUNDTRIP_ORACLE = "SELECT CAST(doc_id AS VARCHAR) AS doc_id, TRUE AS ok FROM documents"


def oracle_sql() -> dict[str, str]:
    return {
        "q01_roundtrip_auto": _ROUNDTRIP_ORACLE,
        "q02_roundtrip_raw": _ROUNDTRIP_ORACLE,
        "q03_roundtrip_for": _ROUNDTRIP_ORACLE,
        "q04_roundtrip_rle": _ROUNDTRIP_ORACLE,
        "q05_roundtrip_dict": _ROUNDTRIP_ORACLE,
        "q06_roundtrip_delta": _ROUNDTRIP_ORACLE,
        "q07_roundtrip_dod": _ROUNDTRIP_ORACLE,
        "q08_roundtrip_fsst": _ROUNDTRIP_ORACLE,
        "q09_manifest_counts": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs_total,"
            " CAST(sum(length(text)) AS BIGINT) AS n_tokens_total,"
            " CAST(4*sum(length(text)) AS BIGINT) AS raw_bytes_total FROM documents"
        ),
        "q10_delta_stage": (
            "SELECT event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER"
            " (PARTITION BY user_id ORDER BY event_id) AS delta_us FROM events"
        ),
        "q11_dod_stage": (
            "WITH d AS (SELECT event_id, user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER"
            " (PARTITION BY user_id ORDER BY event_id) AS delta_us FROM events)"
            " SELECT event_id, delta_us - lag(delta_us) OVER"
            " (PARTITION BY user_id ORDER BY event_id) AS dod_us FROM d"
        ),
        "q12_zigzag_stage": (
            "WITH d AS (SELECT event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER"
            " (PARTITION BY user_id ORDER BY event_id) AS delta_us FROM events)"
            " SELECT event_id, CASE WHEN delta_us >= 0 THEN 2*delta_us"
            " ELSE -2*delta_us - 1 END AS zz FROM d"
        ),
        "q13_rle_runs": (
            "WITH c AS (SELECT o_custkey, o_orderkey, o_orderstatus,"
            " CASE WHEN lag(o_orderstatus) OVER w IS NULL"
            " OR lag(o_orderstatus) OVER w <> o_orderstatus THEN 1 ELSE 0 END AS chg"
            " FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)),"
            " r AS (SELECT o_custkey, o_orderstatus,"
            " CAST(sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderkey"
            " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id FROM c)"
            " SELECT o_custkey, run_id, o_orderstatus,"
            " CAST(count(*) AS BIGINT) AS run_len FROM r"
            " GROUP BY o_custkey, run_id, o_orderstatus"
        ),
        "q14_for_stage": (
            "SELECT p_partkey, p_retailprice - min(p_retailprice) OVER"
            " (PARTITION BY p_brand) AS resid FROM part"
        ),
        "q15_dict_stage": (
            "SELECT event_id, event_type,"
            " CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS code FROM events"
        ),
        "q16_selector_features": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(n_chars) AS BIGINT) AS total_chars,"
            " CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,"
            " CAST(min(n_chars) AS BIGINT) AS min_chars,"
            " CAST(max(n_chars) AS BIGINT) AS max_chars"
            " FROM documents GROUP BY source"
        ),
        "q17_counter_undelta": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
            " CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id"
            " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_chars FROM documents"
        ),
        "q18_timeseries_roundtrip": (
            "SELECT CAST(count(*) AS BIGINT) AS cnt,"
            " CAST(sum(epoch_us(ts) // 1000) AS BIGINT) AS sum_ts_ms,"
            " min(value) AS min_val, max(value) AS max_val FROM events"
        ),
        "q19_clean": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source"
        ),
        "q20_validate": (
            "SELECT 'duplicate_doc_id' AS issue, CAST(5 AS BIGINT) AS n"
        ),
        "q24_roundtrip_container": _ROUNDTRIP_ORACLE,
        "q25_scaledf_roundtrip": (
            "SELECT CAST(count(*) AS BIGINT) AS cnt,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,"
            " min(l_extendedprice) AS min_val, max(l_extendedprice) AS max_val FROM lineitem"
        ),
        "q26_xorlag_roundtrip": (
            "WITH v AS (SELECT round(sin(event_id % 24 / 24 * 6.283185307179586), 6) AS value"
            " FROM events)"
            " SELECT CAST(count(*) AS BIGINT) AS cnt,"
            " CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,"
            " min(value) AS min_val, max(value) AS max_val FROM v"
        ),
        "q28_roundtrip_forc": _ROUNDTRIP_ORACLE,
        "q27_timerange_read": (
            "WITH b AS (SELECT min(epoch_us(ts)) AS lo0, max(epoch_us(ts)) AS hi0 FROM events),"
            " r AS (SELECT lo0 + (hi0 - lo0) // 4 AS lo, lo0 + (hi0 - lo0) // 2 AS hi FROM b)"
            " SELECT CAST(count(*) AS BIGINT) AS cnt,"
            " CAST(sum(epoch_us(ts) // 1000) AS BIGINT) AS sum_ts_ms,"
            " min(value) AS min_val, max(value) AS max_val"
            " FROM events, r WHERE epoch_us(ts) >= lo AND epoch_us(ts) <= hi"
        ),
        # q21_estimate / q22_codec_mix / q23_skew_stats: bit-level + partition
        # topology — not SQL-expressible; rows-only checks.
    }

"""Benchmark harness: encode/decode throughput + compression ratio.

Prints ONE JSON line:
  {"metric": "total_bench_sec", "value": <sum of query secs>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": <sf>,
   "encode_tokens_per_sec": ..., "decode_tokens_per_sec": ...,
   "compression_ratio": ..., "codec_mix": {...}}

Inputs:
  * deterministic synthetic tokens table (FIXTURES.md strata), scale tied to
    $SPARK_GRAFT_SF_DIR's sf (2M docs/sf-unit -> 200k docs at sf0.1),
    generated once and cached as parquet under /tmp/gss_bench_cache;
  * real tables from the sf dir: documents (ascii-token derivation) and
    events (timeseries Gorilla path).

Reference anchors (BASELINE.md): NIF encode 4.3M pts/s single-node;
pure-BEAM 1.5-1.8M pts/s.  Our unit is tokens/sec across all cores.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE = os.environ.get("GSS_BENCH_CACHE", "/tmp/gss_bench_cache")
DOCS_PER_SF_UNIT = 2_000_000  # sf0.1 -> 200k docs (FIXTURES.md bench scale)


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_tokens(spark, sf: float, mult: int = 1) -> str:
    from gorilla_stream_spark.generator import tokens_df

    n_docs = max(1000, int(DOCS_PER_SF_UNIT * sf) * mult)
    path = os.path.join(CACHE, f"tokens_n{n_docs}_seed42")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        tokens_df(spark, n_docs, seed=42).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    from gorilla_stream_spark import decode, encode, estimate
    from gorilla_stream_spark.engine import decode_timeseries, encode_timeseries
    from gorilla_stream_spark.session import get_spark

    sf = sf_of(SF_DIR)
    spark = get_spark(app_name="gss-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    tokens_path = ensure_tokens(spark, sf)
    toks = spark.read.parquet(tokens_path)
    total_tokens = toks.agg(F.sum("n_tok")).first()[0]
    enc_path = os.path.join(CACHE, f"enc_sf{sf}")

    queries: dict[str, float] = {}
    extras: dict = {}

    # warmup: spawn python workers, JIT the scan + arrow path, page-cache the
    # input — recorded queries then measure steady state, not cold start
    toks.agg(F.sum("n_tok")).first()
    encode(toks.limit(2000), codec="auto", num_partitions=int(CPUS)).agg(
        F.sum("enc_bytes")
    ).first()

    # q1: encode auto (headline) — write blocks (realistic sink incl. I/O)
    t0 = time.time()
    enc = encode(toks, codec="auto", num_partitions=int(CPUS))
    # buffers are already entropy-coded; snappy costs ~nothing on them and
    # still covers the metadata columns (zstd-on-zstd wastes CPU in the sink)
    enc.write.mode("overwrite").option("compression", "snappy").parquet(enc_path)
    queries["q1_encode_auto"] = time.time() - t0

    man = (
        spark.read.parquet(enc_path)
        .groupBy("codec")
        .agg(F.count("*").alias("blocks"), F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"))
        .collect()
    )
    raw_b = sum(r["raw"] for r in man)
    enc_b = sum(r["enc"] for r in man)
    extras["codec_mix"] = {r["codec"]: r["blocks"] for r in man}
    extras["compression_ratio"] = enc_b / raw_b if raw_b else None
    extras["encode_tokens_per_sec"] = total_tokens / queries["q1_encode_auto"]

    # q2: decode (read blocks, reconstruct, count all tokens)
    t0 = time.time()
    n_dec = decode(spark.read.parquet(enc_path)).agg(F.sum("n_tok")).first()[0]
    queries["q2_decode"] = time.time() - t0
    assert n_dec == total_tokens, (n_dec, total_tokens)
    extras["decode_tokens_per_sec"] = total_tokens / queries["q2_decode"]

    # q3: selector-only pass (estimate, no buffers built)
    t0 = time.time()
    estimate(toks, num_partitions=int(CPUS)).agg(F.sum("est_bytes")).first()
    queries["q3_estimate"] = time.time() - t0

    # q4: real-text tokens from the sf dir's documents table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dtoks = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("transform(split(text,''), c -> ascii(c))").cast("array<int>").alias("tokens"),
        "source",
    ).withColumn("n_tok", F.size("tokens").cast("int"))
    t0 = time.time()
    denc = encode(dtoks, codec="auto", num_partitions=int(CPUS))
    dstats = denc.agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).first()
    queries["q4_encode_documents"] = time.time() - t0
    extras["documents_ratio"] = dstats["e"] / dstats["r"] if dstats["r"] else None

    # q5: Gorilla timeseries path on events
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)").alias("ts"), "value"
    )
    t0 = time.time()
    tenc = encode_timeseries(ev, num_partitions=int(CPUS))
    tstats = tenc.agg(
        F.sum("n_points").alias("n"), F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")
    ).first()
    queries["q5_encode_timeseries"] = time.time() - t0
    extras["timeseries_ratio"] = tstats["e"] / tstats["r"] if tstats["r"] else None
    extras["timeseries_points_per_sec"] = (tstats["n"] or 0) / queries["q5_encode_timeseries"]

    # q5b: reference-comparable 5M-point benchmark — minute-interval
    # sine+noise, the exact shape of the reference's regression floors
    # (/root/reference/five_million_benchmark.exs:16-18: raw enc >=1.0M,
    # raw dec >=1.5M ops/s single-node).  Generated distributed, encoded +
    # decoded through the Gorilla-analog timeseries path.
    n5m = 5_000_000
    pts = spark.range(n5m).select(
        (F.lit(1_600_000_000) + F.col("id") * 60).alias("ts"),
        (
            F.round(
                F.sin(F.col("id") / 1440.0 * 6.283185307179586) * 10.0
                + F.sin(F.col("id") * 12.9898) * 0.5
                + 20.0,
                3,
            )
        ).alias("value"),
    )
    pts.write.mode("overwrite").parquet(os.path.join(CACHE, "ts5m"))
    pts5 = spark.read.parquet(os.path.join(CACHE, "ts5m"))
    t0 = time.time()
    tenc5 = encode_timeseries(pts5, num_partitions=int(CPUS))
    enc5_path = os.path.join(CACHE, "ts5m_enc")
    tenc5.write.mode("overwrite").parquet(enc5_path)
    queries["q5b_encode_5m_points"] = time.time() - t0
    t5 = spark.read.parquet(enc5_path).agg(
        F.sum("n_points").alias("n"), F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")
    ).first()
    extras["ts5m_encode_points_per_sec"] = n5m / queries["q5b_encode_5m_points"]
    extras["ts5m_ratio"] = t5["e"] / t5["r"] if t5["r"] else None
    t0 = time.time()
    ndec5 = decode_timeseries(spark.read.parquet(enc5_path)).count()
    queries["q5c_decode_5m_points"] = time.time() - t0
    assert ndec5 == n5m, (ndec5, n5m)
    extras["ts5m_decode_points_per_sec"] = n5m / queries["q5c_decode_5m_points"]
    # no-sink variant: comparable to the reference's in-memory 5M-point
    # benchmark (five_million_benchmark.exs measures encode alone, no I/O)
    t0 = time.time()
    encode_timeseries(pts5, num_partitions=int(CPUS)).agg(F.sum("enc_bytes")).first()
    queries["q5d_encode_5m_nosink"] = time.time() - t0
    extras["ts5m_encode_nosink_points_per_sec"] = n5m / queries["q5d_encode_5m_nosink"]

    # q6: per-codec fixed encode micro-benches on the synthetic table
    for codec in ("for", "forc", "rle", "dict", "delta", "dod", "fsst"):
        t0 = time.time()
        encode(toks, codec=codec, num_partitions=int(CPUS)).agg(F.sum("enc_bytes")).first()
        queries[f"q6_encode_{codec}"] = time.time() - t0

    spark.stop()
    out = {
        "metric": "total_bench_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "total_tokens": int(total_tokens),
        **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in extras.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

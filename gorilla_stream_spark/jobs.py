"""spark-submit job entrypoints.

Ship pattern (north rule):

    zip -r engine.zip gorilla_stream_spark
    spark-submit --py-files engine.zip -m ... jobs.py encode \\
        --input /data/tokens --output /data/encoded \\
        --checkpoint /data/ckpt --codec auto --partitions 4096

Subcommands: ``encode`` (checkpointed, resumable), ``decode``,
``verify`` (decode + join + per-row bit-identity check), ``estimate``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark(app: str) -> SparkSession:
    return SparkSession.builder.appName(app).getOrCreate()


def cmd_encode(args) -> int:
    from gorilla_stream_spark.checkpoint import encode_with_checkpoint

    spark = _spark("gss-encode")
    df = spark.read.parquet(args.input)
    m = encode_with_checkpoint(
        spark,
        df,
        output_path=args.output,
        checkpoint_path=args.checkpoint,
        run_id=args.run_id,
        num_partitions=args.partitions,
        codec=args.codec,
        container=args.container,
        container_level=args.level,
    )
    print(json.dumps({k: (float(v) if v is not None else None) for k, v in m.items()}))
    return 0


def cmd_decode(args) -> int:
    from gorilla_stream_spark import decode

    spark = _spark("gss-decode")
    enc = spark.read.parquet(args.input)
    decode(enc, strict=not args.tolerant).write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count()}))
    return 0


def cmd_verify(args) -> int:
    """Round-trip gate: every doc's decoded tokens bit-identical to source."""
    from gorilla_stream_spark import decode

    spark = _spark("gss-verify")
    src = spark.read.parquet(args.source)
    dec = decode(spark.read.parquet(args.encoded))
    joined = src.alias("s").join(dec.alias("d"), "doc_id", "full_outer")
    bad = joined.filter(
        F.col("s.tokens").isNull()
        | F.col("d.tokens").isNull()
        | (F.col("s.tokens") != F.col("d.tokens"))
    ).count()
    total = src.count()
    print(json.dumps({"docs": total, "mismatches": bad, "ok": bad == 0}))
    return 0 if bad == 0 else 1


def cmd_estimate(args) -> int:
    from gorilla_stream_spark import estimate

    spark = _spark("gss-estimate")
    df = spark.read.parquet(args.input)
    rows = (
        estimate(df)
        .groupBy("codec")
        .agg(
            F.count("*").alias("blocks"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("est_bytes").alias("est_bytes"),
        )
        .collect()
    )
    print(json.dumps([r.asDict() for r in rows]))
    return 0


def cmd_analyze(args) -> int:
    """Pattern analysis + config recommendation (reference Config analog)."""
    from gorilla_stream_spark import analyze_and_recommend

    spark = _spark("gss-analyze")
    df = spark.read.parquet(args.input)
    print(json.dumps(analyze_and_recommend(df)))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gorilla_stream_spark.jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode", help="checkpointed resumable encode")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--codec", default="auto")
    e.add_argument("--container", default="none", choices=["none", "auto", "zlib", "zstd"])
    e.add_argument(
        "--level", type=int, default=None,
        help="container compression level (zstd 1-22, zlib 0-9; default codec default)",
    )
    e.add_argument("--partitions", type=int, default=None)
    e.add_argument("--run-id", default="run1")
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help="decode blocks back to token rows")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--tolerant", action="store_true", help="don't fail on crc mismatch")
    d.set_defaults(fn=cmd_decode)

    v = sub.add_parser("verify", help="bit-identity round-trip check")
    v.add_argument("--source", required=True)
    v.add_argument("--encoded", required=True)
    v.set_defaults(fn=cmd_verify)

    s = sub.add_parser("estimate", help="codec selector preview, no encode")
    s.add_argument("--input", required=True)
    s.set_defaults(fn=cmd_estimate)

    a = sub.add_parser("analyze", help="pattern analysis + config recommendation")
    a.add_argument("--input", required=True)
    a.set_defaults(fn=cmd_analyze)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

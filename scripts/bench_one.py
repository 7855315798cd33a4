"""Single-parallelism encode benchmark (one fresh JVM per invocation).

Usage: python scripts/bench_one.py <cpus> <tokens_parquet> [codec] [repeats] [mode]

mode: "bucketed" (default) encodes a pre-bucketed input with no shuffle —
the production layout at 10^12-sequence scale (ingest writes the Iceberg
table bucketed by hash(doc_id); re-shuffling raw tokens every encode run
would dominate the job) — or "shuffle" to include the salted repartition.

Prints one JSON line with best/median wall over `repeats` runs (best-of-N
because local-mode shuffle/scan I/O bursts add multi-second noise).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(sys.argv[1])
    path = sys.argv[2]
    codec = sys.argv[3] if len(sys.argv) > 3 else "auto"
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    mode = sys.argv[5] if len(sys.argv) > 5 else "bucketed"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gorilla_stream_spark import encode

    input_bytes = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path) if f.endswith(".parquet")
    )
    # ~3 splits per core so stragglers don't serialize the tail
    split_bytes = max(4 << 20, input_bytes // (cpus * 3) or (4 << 20))
    spark = (
        SparkSession.builder.appName(f"gss-scale-{cpus}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", str(split_bytes))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark.read.parquet(path)
    shuffle = mode == "shuffle"

    def run():
        return (
            encode(toks, codec=codec, num_partitions=cpus, repartition=shuffle)
            .agg(
                F.sum("n_tokens").alias("t"),
                F.sum("raw_bytes").alias("r"),
                F.sum("enc_bytes").alias("e"),
            )
            .first()
        )

    # warm: full scan + python workers + JIT
    toks.agg(F.sum("n_tok")).first()
    encode(toks.limit(2000), codec=codec, repartition=False).agg(F.sum("enc_bytes")).first()
    walls = []
    row = None
    for _ in range(repeats):
        t0 = time.time()
        row = run()
        walls.append(time.time() - t0)
    spark.stop()
    best = min(walls)
    med = statistics.median(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "mode": mode,
                "repeats": repeats,
                "wall_sec": round(best, 3),
                "wall_median_sec": round(med, 3),
                "walls": [round(w, 2) for w in walls],
                "tokens": int(row["t"]),
                "tps": round(row["t"] / best, 1),
                "tps_median": round(row["t"] / med, 1),
                "ratio": round(row["e"] / row["r"], 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Single-parallelism encode benchmark (one fresh JVM per invocation).

Usage: python scripts/bench_one.py <cpus> <tokens_parquet> [codec]
Prints one JSON line {"cpus": N, "wall_sec": s, "tokens": n, "tps": n/s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(sys.argv[1])
    path = sys.argv[2]
    codec = sys.argv[3] if len(sys.argv) > 3 else "auto"

    from pyspark.sql import functions as F

    from gorilla_stream_spark import encode
    from gorilla_stream_spark.session import get_spark

    spark = get_spark(app_name=f"gss-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    toks = spark.read.parquet(path)
    # warm the JVM + arrow path on a slice so measured run is steady-state
    encode(toks.limit(500), codec=codec, num_partitions=cpus).agg(F.sum("enc_bytes")).first()
    t0 = time.time()
    row = (
        encode(toks, codec=codec, num_partitions=cpus)
        .agg(F.sum("n_tokens").alias("t"), F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e"))
        .first()
    )
    wall = time.time() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": round(wall, 3),
                "tokens": int(row["t"]),
                "tps": round(row["t"] / wall, 1),
                "ratio": round(row["e"] / row["r"], 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

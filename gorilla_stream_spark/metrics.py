"""Task-metrics rollup — the engine analog of the reference's interval
metric snapshots (``/root/reference/lib/gorilla_stream/performance/
metric_snapshots.ex``: a 10-second ops/sec + memory CSV sampler).

Spark already meters every task (run time, cpu time, input bytes, shuffle
bytes, memory spill) per stage; Python cannot attach a JVM
``SparkListener``, but the driver's ``AppStatusStore`` holds the same
aggregates and publishes them on the status REST API when the UI is
enabled (``get_spark(ui=True)``; the store itself is not py4j-callable —
its Scala default-argument methods don't resolve).  The collector
snapshots completed stages and reports the NEW ones since the previous
snapshot, so callers can bracket a query and get its per-stage cost — the
bench emits one rollup per pass.

Degrades to an empty report (never raises): metrics are observability,
not correctness.
"""

from __future__ import annotations

import json
import urllib.request

__all__ = ["StageMetricsCollector", "stage_snapshot"]


def _stages_via_rest(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    if not base:
        return []
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.loads(r.read().decode())


def stage_snapshot(spark) -> list[dict]:
    """All completed stages of the app ([] on any error)."""
    try:
        return _stages_via_rest(spark)
    except Exception:
        return []


_FIELDS = {
    "executor_run_time_ms": "executorRunTime",
    "executor_cpu_time_ms": "executorCpuTime",  # ns in the store; scaled below
    "input_bytes": "inputBytes",
    "output_bytes": "outputBytes",
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "memory_spilled_bytes": "memoryBytesSpilled",
    "disk_spilled_bytes": "diskBytesSpilled",
    "records_read": "inputRecords",
}


class StageMetricsCollector:
    """Diff-based stage metrics: ``collect()`` rolls up stages completed
    since the last ``collect()``/construction."""

    def __init__(self, spark):
        self._spark = spark
        self._seen: set[tuple[int, int]] = {
            (s["stageId"], s["attemptId"]) for s in stage_snapshot(spark)
        }

    def collect(self, top: int = 5) -> dict:
        stages = [
            s
            for s in stage_snapshot(self._spark)
            if (s["stageId"], s["attemptId"]) not in self._seen
        ]
        for s in stages:
            self._seen.add((s["stageId"], s["attemptId"]))
        out: dict = {"n_stages": len(stages)}
        if not stages:
            return out
        for key, field in _FIELDS.items():
            total = sum(int(s.get(field, 0) or 0) for s in stages)
            if field == "executorCpuTime":
                total //= 1_000_000  # ns -> ms
            out[key] = total
        ranked = sorted(stages, key=lambda s: -(s.get("executorRunTime", 0) or 0))
        out["top_stages"] = [
            {
                "stage_id": s["stageId"],
                "run_ms": int(s.get("executorRunTime", 0) or 0),
                "shuffle_write_bytes": int(s.get("shuffleWriteBytes", 0) or 0),
                "input_bytes": int(s.get("inputBytes", 0) or 0),
                "name": (s.get("name") or "")[:80],
            }
            for s in ranked[:top]
        ]
        return out

#!/usr/bin/env python
"""r15 drain decomposition + same-session A/B harness (guide §1).

Times the seven certified streaming drains (q43/q92/q100/q106/q107/
q110/q121) best-of-2 under each conf variant, all within ONE session so
the A/B survives host drift. A StreamingQueryListener records per-query
micro-batch progress (batch ids, durations, state operator commit
times) so the per-drain fixed cost is decomposed, not guessed.

Usage: python scripts/profile_drains_r15.py [variant ...]
Variants (cumulative confs set at session level before the runs):
  base          — committed posture (changelog on via the drain scope)
  nodata        — + spark.sql.streaming.noDataMicroBatches.enabled=false
  trackrows     — + rocksdb.trackTotalNumberOfRows=false
  both          — nodata + trackrows
Writes /tmp/drains_r15_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from rime_wanxiang_logger_spark.operators import all_queries  # noqa: E402
from rime_wanxiang_logger_spark.operators._stage_cache import sharing  # noqa: E402
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402

DRAINS = [
    "q43_stream_hourly",
    "q92_dedup_admit",
    "q100_stream_sessions",
    "q106_stream_attribution",
    "q107_stateful_asof",
    "q110_stream_page_rank",
    "q121_decontaminate_stream",
]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "nodata": {"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    "trackrows": {
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "false"
    },
    "both": {
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "false",
    },
    # async offset/commit-log writes on top of "both" — measured for
    # the VERDICT r15 item-1 adjudication (the scope confs already pin
    # nodata/trackrows after r15, so "async" isolates the tracker).
    "async": {
        "spark.sql.streaming.asyncProgressTracking.enabled": "true",
    },
}


class _Progress(StreamingQueryListener):
    def __init__(self):
        self.events: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.events.append(
            {
                "name": p.name,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
                "stateOperators": [
                    {
                        "operatorName": s.operatorName,
                        "commitTimeMs": s.allUpdatesTimeMs,
                        "numRowsTotal": s.numRowsTotal,
                    }
                    for s in p.stateOperators
                ],
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def _cpu_probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    variants = sys.argv[1:] or ["base"]
    spark = get_spark("drains-r15")
    listener = _Progress()
    spark.streams.addListener(listener)

    import glob

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    registry = all_queries()
    out: dict[str, dict] = {}
    with sharing():
        # warm the shared pins (q121's eval index / banding model) once
        # so every variant sees the same warm-pin state the bench's
        # best-of-2 min sees.
        for name in DRAINS:
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        for tag in variants:
            confs = VARIANTS[tag]
            for k, v in confs.items():
                spark.conf.set(k, v)
            probe0 = _cpu_probe()
            timings: dict[str, float] = {}
            batch_log: dict[str, list] = {}
            for name in DRAINS:
                for _ in range(2):
                    listener.events.clear()
                    t0 = time.perf_counter()
                    registry[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = round(time.perf_counter() - t0, 4)
                    if name not in timings or dt < timings[name]:
                        timings[name] = dt
                        batch_log[name] = list(listener.events)
            probe1 = _cpu_probe()
            for k in confs:
                spark.conf.unset(k)
            out[tag] = {
                "confs": confs,
                "timings": timings,
                "total": round(sum(timings.values()), 3),
                "probes": [probe0, probe1],
                "batches": batch_log,
            }
            print(
                json.dumps(
                    {"variant": tag, "total": out[tag]["total"], "t": timings}
                ),
                flush=True,
            )
    with open("/tmp/drains_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

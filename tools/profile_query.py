#!/usr/bin/env python3
"""Per-stage time attribution for one or more registry queries.

Usage: python tools/profile_query.py <sf_dir> [--skew] <name> [name ...]

Runs each query against the noop sink (guide §1.4) in a UI-enabled
session and prints, per query, wall seconds plus the completed stages
from the local REST endpoint sorted by executor run time — the
empirical side of guide §1.1 without leaving the terminal. Profiling
only: the bench keeps the UI off.

``--skew`` additionally fetches the task-level duration and
shuffle-read quantiles (min/median/max) for each reported stage — the
guide-§2.5 skew diagnostic: a max/median task-duration ratio ≳5 on a
shuffle-read stage marks a hot key worth salting/splitting; ratios
near 1 close the skew question for that stage with evidence.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from iniz_exporters_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    skew = "--skew" in names
    if skew:
        names = [n for n in names if n != "--skew"]
    # Always a UI-enabled session: the stage attribution below reads the
    # local REST endpoint, so a UI-less session would silently print a
    # 0-stage profile (ADVICE r14 #3 — the old get_spark branch was dead
    # code behind an env default and misleading when taken).
    spark = _ui_session()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = "http://localhost:4040/api/v1/applications"
    for name in names:
        spec = REGISTRY[name]
        # warm pass at the smallest scale so codegen/JIT is off the clock
        spec.fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        before = {
            s["stageId"]
            for s in _get(f"{base}/{app_id}/stages?status=complete", [])
        }
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        stages = [
            s
            for s in _get(f"{base}/{app_id}/stages?status=complete", [])
            if s["stageId"] not in before
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(stages)} stages ===")
        for s in stages[:14]:
            print(
                f"  stage {s['stageId']:>5} tasks={s['numCompleteTasks']:>3}"
                f" run={s.get('executorRunTime', 0) / 1e3:7.2f}s"
                f" cpu={s.get('executorCpuTime', 0) / 1e9:7.2f}s"
                f" shRead={s.get('shuffleReadBytes', 0):>9}"
                f" shWrite={s.get('shuffleWriteBytes', 0):>9}"
                f"  {s.get('name', '')[:60]}"
            )
            if skew and s["numCompleteTasks"] > 1:
                q = _get(
                    f"{base}/{app_id}/stages/{s['stageId']}/"
                    f"{s.get('attemptId', 0)}/taskSummary"
                    f"?quantiles=0.0,0.5,1.0",
                    None,
                )
                if q:
                    dmin, dmed, dmax = (x / 1e3 for x in q["duration"])
                    rmin, rmed, rmax = q.get(
                        "shuffleReadMetrics", {}
                    ).get("readBytes", [0, 0, 0])
                    ratio = dmax / dmed if dmed else float("inf")
                    print(
                        f"        task dur min/med/max ="
                        f" {dmin:.2f}/{dmed:.2f}/{dmax:.2f}s"
                        f"  max/med={ratio:.1f}x"
                        f"  shRead med/max={int(rmed)}/{int(rmax)}"
                    )
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist()
        spark.catalog.clearCache()


def _ui_session():
    from pyspark.sql import SparkSession

    from iniz_exporters_spark.session import (
        DEFAULT_AQE_MIN_PARTITION_SIZE,
        DEFAULT_SHUFFLE_PARTITIONS,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS
    )
    return (
        SparkSession.builder.appName("profile-query")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get(
                "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE",
                DEFAULT_AQE_MIN_PARTITION_SIZE,
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _get(url: str, default):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)
    except Exception as e:
        # Loud, not silent: an unreachable UI endpoint means the profile
        # below is empty — say so instead of printing a plausible 0-stage
        # table (ADVICE r14 #3).
        print(f"WARNING: UI endpoint unreachable ({url}): {e}",
              file=sys.stderr)
        return default


if __name__ == "__main__":
    main()

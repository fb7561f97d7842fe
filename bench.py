#!/usr/bin/env python3
"""Benchmark: run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iniz_exporters_spark.queries import REGISTRY
from iniz_exporters_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("iniz-exporters-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in REGISTRY.items() if s.headline}

    def run(spec, d):
        # noop sink: full distributed evaluation of every output column,
        # no driver-side row materialization — measures the engine, not
        # py4j deserialization of the result set
        spec.fn(spark, d).write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on the smallest SF so per-query times measure the
    # plan, not first-call compilation
    for spec in headline.values():
        run(spec, "/root/testdata/sf0.001")

    times: dict[str, float] = {}
    for name, spec in headline.items():
        t0 = time.perf_counter()
        run(spec, sf_dir)
        times[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dump .explain('formatted') for headline queries to a directory.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for every headline query (or the
named subset). Plans are analysis-time (AdaptiveSparkPlan
isFinalPlan=false) — the shape evidence (Exchange count, join strategy,
PushedFilters, Python-eval nodes) the optimization round needs.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from iniz_exporters_spark.queries import REGISTRY
from iniz_exporters_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    suffix = sys.argv[3]
    names = sys.argv[4:]
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    if names:
        specs = {n: REGISTRY[n] for n in names}
    else:
        specs = {n: s for n, s in REGISTRY.items() if s.headline}
    for name, spec in specs.items():
        df = spec.fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_text(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Streaming sinks: idempotent keyed upsert via foreachBatch.

Structured Streaming's built-in file sink is append-only; maintaining a
keyed snapshot (latest row per key) needs MERGE semantics. Without a
transactional table format, the portable pattern is snapshot versioning:
each micro-batch writes a COMPLETE new snapshot directory ``v<epoch>``
derived from (previous snapshot ∪ batch), then atomically advances a
pointer file. Readers resolve the pointer and only ever see a fully
committed version — no in-place overwrite, no torn reads, and replaying a
batch (checkpoint recovery) simply rewrites the same version id, which
makes the sink idempotent under at-least-once delivery.

At cluster scale the per-batch cost is one key-co-partitioned anti-join +
a rewrite of the snapshot — the right baseline until a transactional
format (which implements exactly this with metadata instead of rewrites)
is available. For bounded state, compose with a watermark upstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


_POINTER = "_LATEST"


def _latest_version(out_dir: str) -> str | None:
    p = os.path.join(out_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        v = f.read().strip()
    return os.path.join(out_dir, v) if v else None


def read_snapshot(spark, out_dir: str) -> DataFrame | None:
    """Current committed snapshot, or None before the first commit."""
    v = _latest_version(out_dir)
    return spark.read.parquet(v) if v else None


def upsert_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_col: str,
):
    """Start an availableNow foreachBatch query maintaining a keyed
    snapshot at ``out_dir``. Within a batch the highest ``seq_col`` row per
    key wins; across batches the batch beats the previous snapshot.
    Returns the started StreamingQuery (caller awaits termination).

    Version ids are allocated as max(existing)+1 — NOT the micro-batch id,
    which restarts at 0 under a fresh checkpoint and would overwrite the
    very version the pointer still serves. A recovery replay that already
    committed writes one extra (identical) version — harmless, and
    ``vacuum_snapshots`` reclaims it; the pointer swap stays the single
    atomic commit point either way.
    """
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        dedup = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        prev = read_snapshot(spark, out_dir)
        if prev is not None:
            dedup = prev.join(
                dedup.select(*key_cols), on=key_cols, how="left_anti"
            ).unionByName(dedup)
        existing = (
            [
                int(d[1:])
                for d in os.listdir(out_dir)
                if re.fullmatch(r"v\d+", d)
            ]
            if os.path.isdir(out_dir)
            else []
        )
        ver = max(existing, default=-1) + 1
        vdir = os.path.join(out_dir, f"v{ver}")
        dedup.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(out_dir, f"._LATEST.{ver}")
        with open(tmp, "w") as f:
            f.write(f"v{ver}")
        os.replace(tmp, os.path.join(out_dir, _POINTER))

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_snapshots(out_dir: str, keep: int = 2) -> list[str]:
    """Delete all but the newest ``keep`` snapshot versions (never the one
    the pointer names). Returns the removed version names. Safe order:
    readers resolve the pointer first, and the pointer's target is always
    retained, so a concurrent read of a retained version never breaks.
    """
    import re
    import shutil

    current = _latest_version(out_dir)
    versions = sorted(
        (
            d
            for d in os.listdir(out_dir)
            if re.fullmatch(r"v\d+", d)
            and os.path.isdir(os.path.join(out_dir, d))
        ),
        key=lambda d: int(d[1:]),
    )
    protect = {os.path.basename(current)} if current else set()
    protect.update(versions[-keep:])
    removed = []
    for d in versions:
        if d not in protect:
            shutil.rmtree(os.path.join(out_dir, d))
            removed.append(d)
    return removed

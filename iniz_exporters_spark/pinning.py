"""The engine's single materialization-pin switch (VERDICT r14 #6).

Every multi-consumer frame in the engine — a kernel output read by both
sides of a self-join, an aggregate consumed by two branches, an iterative
fixpoint frontier — is pinned through :func:`pin` so that the subtree
evaluates ONCE instead of once per consumer. The *storage strategy* behind
the pin is one switch here, not ~100 open-coded call sites:

``SPARK_GRAFT_PIN`` selects the strategy (default ``localcheckpoint``):

* ``localcheckpoint`` — ``DataFrame.localCheckpoint``: truncates lineage
  and stores executor-local blocks (MEMORY_AND_DISK). The right local /
  single-JVM call: cheapest barrier, no checkpoint dir needed.
  **100 TB caveat** (guide §5): the blocks are NOT replicated and the
  lineage is gone, so on a real cluster an executor loss kills the job
  instead of recomputing the lost partitions, and every pinned frame adds
  executor memory/disk pressure the local bench never sees.
* ``reliable`` — ``DataFrame.checkpoint``: same lineage truncation, but
  blocks go to the fault-tolerant checkpoint directory
  (``SPARK_GRAFT_CHECKPOINT_DIR``, default ``<java.io.tmpdir>/
  spark-graft-ckpt``; on a cluster point it at HDFS/object storage).
  This is the production strategy at 100 TB when a pinned frame is too
  expensive to lose with an executor.
* ``persist`` — ``persist(MEMORY_AND_DISK)``: recomputable (lineage kept,
  so executor loss just recomputes) but NO plan truncation — iterative
  fixpoints (connected components, BPE merge rounds, chained cumsums)
  would grow their logical plan without bound and stall the optimizer
  (guide §7.3). Offered as an A/B knob for non-iterative pins only; the
  eager form materializes via ``count()`` on the persisted frame.

Lineage truncation is load-bearing for the iterative callers, which is
why ``persist`` is not the default anywhere and why the strategy is one
global switch: flipping it is a deliberate, whole-engine experiment, not
a per-site accident.

Call shape: sites use ``df.transform(pin)`` (lazy) or
``df.transform(pin, eager=True)`` so the pin reads naturally in builder
chains; ``pin(df)`` works too.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_VALID = ("localcheckpoint", "reliable", "persist")


def _strategy() -> str:
    s = os.environ.get("SPARK_GRAFT_PIN", "localcheckpoint").lower()
    if s not in _VALID:
        raise ValueError(
            f"SPARK_GRAFT_PIN={s!r}: expected one of {_VALID}"
        )
    return s


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialization pin for a multi-consumer DataFrame.

    ``eager=False`` (default) defers materialization to the frame's first
    action — the usual choice, since the first consumer's job pays for it
    exactly once either way. ``eager=True`` materializes now; callers use
    it when the pin must happen inside the current job boundary (e.g. a
    fixpoint round that is about to mutate its own input).
    """
    # eager-vs-lazy is a measured decision, not a style choice (r15 A/B,
    # OPTIMIZATION_r15.md): forcing every eager straight-line pin lazy
    # read +11..+41 % on the pin-heavy headline queries — with the pin
    # unmaterialized, AQE's concurrent stage-jobs race on the shared
    # frame and serialize on block locks. Keep straight-line
    # multi-consumer pins EAGER; iterative loops own their
    # materialization via a count() per round (plans/graph.py).
    strategy = _strategy()
    if strategy == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    if strategy == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(
                os.environ.get(
                    "SPARK_GRAFT_CHECKPOINT_DIR",
                    os.path.join(tempfile.gettempdir(), "spark-graft-ckpt"),
                )
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

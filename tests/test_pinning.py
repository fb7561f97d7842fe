"""pin() — the engine's single materialization-pin switch (VERDICT r14 #6).

Every multi-consumer frame routes through pinning.pin; the storage
strategy behind it is one env switch, not ~100 open-coded call sites.
These tests pin the switch's contract: the default is localCheckpoint
(plan truncated, results identical), every declared strategy returns the
same rows, and an unknown strategy fails loudly instead of silently
falling back.
"""

import pytest

from iniz_exporters_spark.pinning import pin


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_default_strategy_truncates_lineage(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PIN", raising=False)
    df = spark.range(100).selectExpr("id", "id * 2 AS y")
    pinned = df.transform(pin)
    # localCheckpoint replaces the subtree with an RDD scan
    assert "ExistingRDD" in pinned._jdf.queryExecution().optimizedPlan().toString() or \
        "LogicalRDD" in pinned._jdf.queryExecution().optimizedPlan().toString()
    assert _rows(pinned) == _rows(df)


@pytest.mark.parametrize("strategy", ["localcheckpoint", "reliable", "persist"])
def test_every_strategy_returns_identical_rows(spark, monkeypatch, strategy):
    monkeypatch.setenv("SPARK_GRAFT_PIN", strategy)
    df = spark.range(50).selectExpr("id", "id % 7 AS k")
    out = df.transform(pin, eager=True)
    assert _rows(out) == _rows(df)
    out.unpersist() if strategy == "persist" else None


def test_unknown_strategy_fails_loudly(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIN", "memoize")
    with pytest.raises(ValueError, match="SPARK_GRAFT_PIN"):
        spark.range(3).transform(pin)

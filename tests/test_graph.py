"""Ported reference graph-operator contracts
(reference concepts/src/test_concept_csv_export.py:33-103) plus the
distributed fixpoint variants.
"""

import pyspark.sql.functions as F
import pytest

from iniz_exporters_spark.plans.graph import (
    CycleError,
    detect_cycles_rows,
    distributed_reachable,
    distributed_topo_levels,
    exclude,
    get_all_concepts_in_tree,
    move_referring_concepts_down,
    topo_order,
)

KEY = "Fully specified name:en"


def rows(*triples):
    return [
        {KEY: k, "Answers": a, "Members": m} for k, a, m in triples
    ]


DAG = rows(
    ("a", "", "b;c"),
    ("b", "", "d;e"),
    ("c", "d;e", ""),
    ("d", "", ""),
    ("e", "", ""),
)


def test_move_referring_concepts_down():
    # reference test_concept_csv_export.py:33-50 — partial-order contract
    res = [c[KEY] for c in move_referring_concepts_down(DAG, KEY)]
    assert res.index("a") > res.index("b")
    assert res.index("a") > res.index("c")
    assert res.index("b") > res.index("d")
    assert res.index("b") > res.index("e")
    assert res.index("c") > res.index("d")
    assert res.index("c") > res.index("e")


def test_get_all_concepts_in_tree():
    # reference test_concept_csv_export.py:53-69 — reachability set-equality
    assert {c[KEY] for c in get_all_concepts_in_tree(DAG, "a", KEY)} == {
        "a", "b", "c", "d", "e",
    }
    assert {c[KEY] for c in get_all_concepts_in_tree(DAG, "b", KEY)} == {
        "b", "d", "e",
    }
    assert {c[KEY] for c in get_all_concepts_in_tree(DAG, "d", KEY)} == {"d"}


def test_detect_cycles():
    # reference test_concept_csv_export.py:72-87 — message + line-count
    cyclic = rows(
        ("a", "", "b;c"),
        ("b", "", ""),
        ("c", "d;e", ""),
        ("d", "e;f", ""),
        ("e", "", ""),
        ("f", "c;e", ""),
    )
    with pytest.raises(CycleError) as exc:
        detect_cycles_rows(cyclic, KEY)
    assert "c --> d --> f --> c" in str(exc.value)
    assert str(exc.value).count("\n\t") == 1  # only one cycle printed


def test_integration():
    # reference test_concept_csv_export.py:90-103 — exact output order
    concepts = rows(
        ("a", "", "b"),
        ("b", "c", ""),
        ("c", "", ""),
        ("d", "", ""),
    )
    concepts = get_all_concepts_in_tree(concepts, "a", KEY)
    detect_cycles_rows(concepts, KEY)
    concepts = move_referring_concepts_down(concepts, KEY)
    concepts = exclude(concepts, ["b"], key=KEY)
    assert [c[KEY] for c in concepts] == ["c", "a"]


def test_topo_order_cycle_guard():
    with pytest.raises(CycleError):
        topo_order(["a", "b"], {"a": ["b"], "b": ["a"]})


def test_distributed_variants(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y")],
        ["src", "dst"],
    )
    roots = spark.createDataFrame([("a",)], ["node"])
    got = {r.node for r in distributed_reachable(edges, roots).collect()}
    assert got == {"a", "b", "c", "d", "e"}

    lv = {r.node: r.lvl for r in distributed_topo_levels(edges).collect()}
    assert lv == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3, "x": 0, "y": 1}


def test_connected_components_two_islands(spark):
    from iniz_exporters_spark.plans.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src long, dst long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_fixpoint_nonconvergence_raises(spark):
    """Exhausting max_iters before convergence must raise, not silently
    return wrong labels/levels (a chain of length 6 cannot converge in 2
    propagation rounds)."""
    from iniz_exporters_spark.plans.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    with pytest.raises(RuntimeError, match="did not converge"):
        distributed_topo_levels(chain, max_iters=2)
    roots = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(RuntimeError, match="did not converge"):
        distributed_reachable(chain, roots, max_iters=2)
    # and a budget that fits converges to the right answer
    got = {r["component"] for r in connected_components(chain, max_iters=10).collect()}
    assert got == {0}


def test_star_components_matches_propagation_random(spark):
    """Star contraction and min-label propagation must produce identical
    labels on arbitrary graphs (mixed cliques + chains + singleton edge)."""
    import random

    from iniz_exporters_spark.plans.graph import connected_components

    rng = random.Random(11)
    pairs = {tuple(sorted(rng.sample(range(60), 2))) for _ in range(70)}
    pairs |= {(100, 101)}  # isolated island
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    prop = {
        (r["node"], r["component"])
        for r in connected_components(edges, method="propagation").collect()
    }
    star = {
        (r["node"], r["component"])
        for r in connected_components(edges, method="star").collect()
    }
    assert star == prop


@pytest.mark.slow  # r15 gate budget: covered by a cheaper fast sibling; runs at round close (--runslow)
def test_star_components_path_graph_olog_rounds(spark):
    """A 10k-node path has diameter 10k: propagation needs ~10k rounds,
    star contraction must converge within an O(log n) budget (30 rounds —
    log2(10000) ~ 13.3 plus slack) and label every node with the min."""
    from iniz_exporters_spark.plans.graph import connected_components

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = connected_components(chain, max_iters=30, method="star")
    agg = got.agg(
        F.count("*").alias("n"),
        F.countDistinct("component").alias("c"),
        F.min("component").alias("m"),
    ).collect()[0]
    assert (agg["n"], agg["c"], agg["m"]) == (n, 1, 0)


def test_star_components_unknown_method_raises(spark):
    from iniz_exporters_spark.plans.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="propagation"):
        connected_components(edges, method="bogus")


def test_canonical_per_component_with_singletons(spark):
    from iniz_exporters_spark.plans.graph import canonical_per_component

    pairs = spark.createDataFrame([(5, 9), (9, 7)], "a long, b long")
    ids = spark.createDataFrame([(5,), (7,), (9,), (42,)], "doc_id long")
    got = {
        (r["doc_id"], r["canonical_id"], r["is_canonical"])
        for r in canonical_per_component(pairs, ids).collect()
    }
    assert got == {
        (5, 5, True),
        (7, 5, False),
        (9, 5, False),
        (42, 42, True),
    }

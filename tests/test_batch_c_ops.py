"""Unit contracts for the round-4 batch-C operators: record linkage,
interpolated LM perplexity, the hashing trick, degree-oriented triangle
counting, truncated EWMA, and bloom join pruning."""

import itertools

import pyspark.sql.functions as F

from iniz_exporters_spark.functions.text import feature_hash_vector, tokens
from iniz_exporters_spark.operators.indexing import bloom_candidates
from iniz_exporters_spark.operators.linkage import record_linkage_pairs
from iniz_exporters_spark.operators.lm import interpolated_perplexity
from iniz_exporters_spark.operators.timeseries import ewma
from iniz_exporters_spark.plans.graph import triangle_stats

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Record linkage
# ---------------------------------------------------------------------------


def test_record_linkage_finds_near_matches_within_block(spark):
    rows = [
        (1, "acme corp"),
        (2, "acme corp."),      # lev 1 from id 1
        (3, "acme corporation"),  # lev > 4 from "acme corp"? (=6) dropped
        (4, "zenith ltd"),
        (5, "zenith ltd"),      # exact dup of id 4
        (6, "bcme corp"),       # different block (first char b)
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    bk = F.substring("name", 1, 1)
    out = record_linkage_pairs(df, "id", "name", bk, max_lev=4, min_sim=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["lev"] for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(4, 5)] == 0
    # cross-block pair never generated even though lev("acme","bcme")=1
    assert (1, 6) not in pairs and (2, 6) not in pairs
    # lev 7 ("acme corp" -> "acme corporation") exceeds max_lev
    assert (1, 3) not in pairs


def test_record_linkage_block_size_guard(spark):
    # 30 identical-block rows with tiny edits; max_block=10 drops the block
    rows = [(i, f"name{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = record_linkage_pairs(
        df, "id", "name", F.lit("onlyblock"), max_lev=4, min_sim=0.1,
        max_block=10,
    )
    assert out.count() == 0


def test_record_linkage_pairs_are_canonical(spark):
    df = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    bk = F.element_at(F.split("p_name", " "), 2)
    out = record_linkage_pairs(df, "p_partkey", "p_name", bk).collect()
    assert all(r["id_a"] < r["id_b"] for r in out)
    assert len({(r["id_a"], r["id_b"]) for r in out}) == len(out)


# ---------------------------------------------------------------------------
# Interpolated perplexity (CCNet buckets)
# ---------------------------------------------------------------------------


def test_perplexity_repetitive_doc_scores_lower(spark):
    rows = [(i, "the cat sat on the mat", "en") for i in range(5)]
    rows.append((99, "zq xv qqk vxz plw wlp", "en"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r
        for r in interpolated_perplexity(df, "doc_id", "text").collect()
    }
    common = out[0]["ppl"]
    rare = out[99]["ppl"]
    assert common < rare
    # tail bucket catches the gibberish doc
    assert out[99]["bucket"] == 3


def test_perplexity_buckets_are_per_language_terciles(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = interpolated_perplexity(df, "doc_id", "text").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        buckets = {r["bucket"] for r in rows}
        assert buckets <= {1, 2, 3}
        if len(rows) >= 3:
            assert buckets == {1, 2, 3}
            # bucket ordering follows ppl ordering
            max_head = max(r["ppl"] for r in rows if r["bucket"] == 1)
            min_tail = min(r["ppl"] for r in rows if r["bucket"] == 3)
            assert max_head <= min_tail


# ---------------------------------------------------------------------------
# Hashing trick
# ---------------------------------------------------------------------------


def test_feature_hash_mass_conservation(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    out = df.select(
        feature_hash_vector("text", dim=32).alias("vec"),
        F.size(tokens("text")).alias("n"),
    ).collect()
    for r in out:
        assert len(r["vec"]) == 32
        assert sum(r["vec"]) == r["n"]  # every token lands in one bucket


def test_feature_hash_is_deterministic_and_shuffle_free(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = df.select("doc_id", feature_hash_vector("text").alias("v"))
    b = df.repartition(7).select(
        "doc_id", feature_hash_vector("text").alias("v")
    )
    assert sorted(map(tuple, (r["v"] for r in a.collect()))) == sorted(
        map(tuple, (r["v"] for r in b.collect()))
    )
    # the vectorization itself adds no exchange
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def _brute_triangles(edges):
    es = set(map(tuple, edges))
    nodes = sorted({n for e in edges for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_triangle_stats_complete_graph(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, ["a", "b"])
    r = triangle_stats(df).collect()[0]
    assert r["n_triangles"] == 10  # C(5,3)
    assert r["clustering"] == 1.0


def test_triangle_stats_triangle_free(spark):
    # star graph: many wedges, zero triangles
    edges = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(edges, ["a", "b"])
    r = triangle_stats(df).collect()[0]
    assert r["n_triangles"] == 0
    assert r["clustering"] == 0.0
    assert r["n_wedges"] == 21  # C(7,2) at the hub


def test_triangle_stats_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(20), 2)))
            for _ in range(80)
        }
    )
    df = spark.createDataFrame(edges, ["a", "b"])
    r = triangle_stats(df).collect()[0]
    assert r["n_triangles"] == _brute_triangles(edges)
    assert r["n_edges"] == len(edges)


def test_clustering_coeff_q_matches_bruteforce(spark):
    """Per-node triangle counts of clustering_coeff_q vs an independent
    brute-force over the same co-purchase graph.

    Guards the wedge-closure key: the closing edge is stored in the
    degree-oriented edge list as (src=y, dst=z) in DEGREE order; an
    id-ordered least/greatest probe silently drops every triangle where
    deg(y) < deg(z) but y > z numerically — and the oracle replicated
    that bug, so only a third, brute-force implementation catches it.
    """
    import duckdb

    from iniz_exporters_spark.queries import REGISTRY

    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet') a
        JOIN read_parquet('{SF_SMALL}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {
        n: sum(
            1
            for x, y in itertools.combinations(sorted(nbrs), 2)
            if y in adj[x]
        )
        for n, nbrs in adj.items()
    }
    expect = sorted(
        ((n, len(adj[n]), t) for n, t in tri.items()),
        key=lambda r: (-r[2], r[0]),
    )[:30]
    got = [
        (r["node"], r["degree"], r["n_triangles"])
        for r in REGISTRY["clustering_coeff_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_python_truncated_recursion(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 10, 40, 5, 5])]
    df = spark.createDataFrame(rows, ["k", "i", "v"]).withColumn(
        "ts", F.col("i").cast("timestamp")
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma(df, "k", "ts", "v", "i", alpha=0.3, depth=8).collect()
    }
    vals = [10.0, 20.0, 10.0, 40.0, 5.0, 5.0]
    for i in range(len(vals)):
        acc = 0.0
        for x in vals[max(0, i - 7): i + 1]:
            acc = acc * 0.7 + x * 0.3
        assert abs(out[i] - acc) < 1e-12


def test_ewma_partition_invariant(spark):
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    a = ewma(df, "user_id", "ts", "value", "event_id").collect()
    b = ewma(
        df.repartition(7), "user_id", "ts", "value", "event_id"
    ).collect()
    ka = sorted((r["event_id"], r["ewma"]) for r in a)
    kb = sorted((r["event_id"], r["ewma"]) for r in b)
    assert ka == kb


# ---------------------------------------------------------------------------
# Bloom pruning
# ---------------------------------------------------------------------------


def test_bloom_candidates_no_false_negatives(spark):
    fact = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    cand = bloom_candidates(fact, "l_suppkey", dim, "s_suppkey", m=1024)
    true_rows = fact.join(
        dim, fact["l_suppkey"] == dim["s_suppkey"], "left_semi"
    ).count()
    # every true match survives the bloom
    survived = cand.join(
        dim, cand["l_suppkey"] == dim["s_suppkey"], "left_semi"
    ).count()
    assert survived == true_rows
    # and the filter actually pruned the fact table
    assert cand.count() < fact.count()


def test_bloom_filter_runs_at_scan_no_exchange(spark):
    fact = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    cand = bloom_candidates(fact, "l_suppkey", dim, "s_suppkey")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-side filter


# ---------------------------------------------------------------------------
# Batch D: grid density, stratified allocation, rolling autocorrelation
# ---------------------------------------------------------------------------


def test_grid_density_matches_bruteforce_neighborhoods(spark):
    from iniz_exporters_spark.operators.clustering import grid_density

    pts = [(i, (i % 5) * 0.05, (i // 5) * 0.05) for i in range(25)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    out = grid_density(df, "id", F.col("x"), F.col("y"), h=0.1, min_pts=4)
    cells = {p[0]: (int(p[1] // 0.1), int(p[2] // 0.1)) for p in pts}
    for r in out.collect():
        cx, cy = cells[r["id"]]
        want = sum(
            1
            for c in cells.values()
            if abs(c[0] - cx) <= 1 and abs(c[1] - cy) <= 1
        )
        assert r["nbr_count"] == want
        assert r["is_core"] == (want >= 4)


def test_grid_density_isolated_point_is_outlier(spark):
    pts = [(i, 0.01 * i, 0.01 * i) for i in range(20)] + [(99, 5.0, 5.0)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    from iniz_exporters_spark.operators.clustering import grid_density

    out = {r["id"]: r for r in grid_density(
        df, "id", F.col("x"), F.col("y"), h=0.1, min_pts=5
    ).collect()}
    assert not out[99]["is_core"]
    assert out[0]["is_core"]


def test_stratified_allocation_exact_total_and_quota_bound(spark):
    from iniz_exporters_spark.operators.sampling import stratified_allocation

    df = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    out = stratified_allocation(df, "c_mktsegment", "c_custkey", 100).collect()
    assert sum(r["n_alloc"] for r in out) == 100
    total = sum(r["n_stratum"] for r in out)
    for r in out:
        quota = 100 * r["n_stratum"] / total
        # Hamilton: every stratum gets floor(quota) or floor(quota)+1
        assert int(quota) <= r["n_alloc"] <= int(quota) + 1


def test_stratified_take_is_partition_invariant(spark):
    from iniz_exporters_spark.operators.sampling import stratified_take

    df = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    a = sorted(
        r["c_custkey"]
        for r in stratified_take(df, "c_mktsegment", "c_custkey", 60).collect()
    )
    b = sorted(
        r["c_custkey"]
        for r in stratified_take(
            df.repartition(7), "c_mktsegment", "c_custkey", 60
        ).collect()
    )
    assert a == b and len(a) == 60


def test_rolling_autocorr_trend_and_alternation(spark):
    from iniz_exporters_spark.operators.timeseries import rolling_autocorr

    rows = [(1, i, float(i)) for i in range(20)]  # pure trend -> corr 1
    rows += [(2, i, float(i % 2)) for i in range(20)]  # alternating -> -1
    rows += [(3, i, 7.0) for i in range(20)]  # constant -> NULL
    df = spark.createDataFrame(rows, ["k", "i", "v"]).withColumn(
        "ts", F.col("i").cast("timestamp")
    )
    out = rolling_autocorr(df, "k", "ts", "v", "i", window_rows=16).collect()
    last = {(r["k"], r["i"]): r["corr"] for r in out}
    assert abs(last[(1, 19)] - 1.0) < 1e-9
    assert abs(last[(2, 19)] + 1.0) < 1e-9
    assert last[(3, 19)] is None


# ---------------------------------------------------------------------------
# Batch E: k-core, RAKE, Markov transitions
# ---------------------------------------------------------------------------


def _brute_kcore(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if sum(1 for m in adj[n] if m in alive) < k}
        if not drop:
            break
        alive -= drop
    return {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }


def test_kcore_matches_bruteforce(spark):
    import random

    from iniz_exporters_spark.plans.graph import kcore_membership

    rng = random.Random(11)
    edges = sorted(
        {tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)}
    )
    df = spark.createDataFrame(edges, ["a", "b"])
    for k in (3, 5, 7):
        got = {
            r["node"]: r["degree"]
            for r in kcore_membership(df, k=k, rounds=30).collect()
        }
        assert got == _brute_kcore(edges, k)


def test_kcore_converges_on_copurchase_graph_within_bound(spark):
    """The shipped kcore_q contract: 6 bounded rounds reach the true
    fixpoint on the co-purchase graph at the smallest scale."""
    from iniz_exporters_spark.plans.graph import kcore_membership

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k").filter(F.col("a") < F.col("b")).select("a", "b")
        .distinct()
    )
    bounded = {
        (r["node"], r["degree"])
        for r in kcore_membership(edges, k=80, rounds=6).collect()
    }
    converged = {
        (r["node"], r["degree"])
        for r in kcore_membership(edges, k=80, rounds=50).collect()
    }
    assert bounded == converged


def test_rake_scores_multiword_phrase_highest(spark):
    from iniz_exporters_spark.operators.ranking import rake_keywords

    # classic RAKE behavior: multi-word content phrases outrank single
    # frequent words because deg accumulates phrase length
    df = spark.createDataFrame(
        [(1, "deep learning models and the deep learning pipeline for data")],
        ["doc_id", "text"],
    )
    out = rake_keywords(df, "doc_id", "text", top_n=2).collect()
    top = [r["phrase"] for r in sorted(out, key=lambda r: r["rank"])]
    assert top[0] in ("deep learning models", "deep learning pipeline")
    assert all(" " in p or p == "data" for p in top)


def test_markov_probs_sum_to_one_per_src(spark):
    from iniz_exporters_spark.queries import REGISTRY

    out = REGISTRY["markov_transitions_q"].fn(spark, SF_SMALL).collect()
    import collections

    by_src = collections.defaultdict(float)
    for r in out:
        by_src[r["src"]] += r["prob"]
    for src, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-9

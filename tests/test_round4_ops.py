"""Unit contracts for the round-4 operators: exact distributed PCA,
incremental batch-vs-corpus near-dup, length-bucketed training batches,
and DSIR importance weights."""

import math

import pyspark.sql.functions as F

from iniz_exporters_spark.functions.text import tokens
from iniz_exporters_spark.operators.curation import dsir_weights
from iniz_exporters_spark.operators.dedup import (
    incremental_neardup,
    neardup_pairs,
)
from iniz_exporters_spark.operators.lm import length_bucketed_batches
from iniz_exporters_spark.operators.pca import (
    covariance_pairs,
    pca_fit,
    pca_project_cols,
    projection_variances,
)

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


def test_covariance_matches_numpy(spark):
    import numpy as np

    e = _embs(spark)
    X = np.array(
        [r["embedding"][:6] for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    want = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = {(r["i"], r["j"]): r["cov"] for r in
           covariance_pairs(e, "embedding", dims=6).collect()}
    assert len(got) == 6 * 7 // 2
    for i in range(6):
        for j in range(i, 6):
            assert abs(got[(i, j)] - want[i, j]) < 1e-5, (i, j)


def test_covariance_partition_invariant(spark):
    e = _embs(spark)
    a = sorted(map(tuple, covariance_pairs(e, "embedding", 5).collect()))
    b = sorted(
        map(tuple, covariance_pairs(e.repartition(7), "embedding", 5).collect())
    )
    assert a == b  # exact decimal sums -> bit-identical under any layout


def test_pca_projection_variance_equals_eigval(spark):
    e = _embs(spark)
    model = pca_fit(e, "embedding", dims=6, top_k=3)
    assert model.eigvals == sorted(model.eigvals, reverse=True)
    pvars = projection_variances(e, "embedding", model)
    for k in range(3):
        assert abs(pvars[k] - model.eigvals[k]) <= 1e-3 * max(
            1.0, model.eigvals[0]
        ), k
    # components are unit vectors with the sign fixed deterministically
    for w in model.components:
        assert abs(math.fsum(x * x for x in w) - 1.0) < 1e-9
        best = max(range(len(w)), key=lambda i: (abs(w[i]), -i))
        assert w[best] > 0


def test_pca_projection_is_codegen_column(spark):
    e = _embs(spark)
    model = pca_fit(e, "embedding", dims=4, top_k=2)
    out = e.select("vec_id", *pca_project_cols(model, "embedding", round_to=4))
    assert out.columns == ["vec_id", "pc0", "pc1"]
    # no Python eval in the plan: projection must be pure expressions
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert out.count() == e.count()


# ---------------------------------------------------------------------------
# Incremental near-dup
# ---------------------------------------------------------------------------


def test_incremental_neardup_matches_self_join_cross_pairs(spark):
    d = _docs(spark)
    batch = d.filter(F.col("doc_id") % 10 == 3)
    corpus = d.filter(F.col("doc_id") % 10 != 3)
    inc = {
        (r["batch_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_neardup(
            corpus, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # the full self-join restricted to cross-split pairs must agree exactly
    full = neardup_pairs(d, "doc_id", "text", threshold=0.5).collect()
    want = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if (a % 10 == 3) != (b % 10 == 3):
            bid, cid = (a, b) if a % 10 == 3 else (b, a)
            want.add((bid, cid, r["jaccard"]))
    assert inc == want
    assert want, "fixture has no cross-split near-dups; test is vacuous"


def test_incremental_neardup_broadcast_plan(spark):
    d = _docs(spark)
    batch = d.filter(F.col("doc_id") % 10 == 3)
    corpus = d.filter(F.col("doc_id") % 10 != 3)
    out = incremental_neardup(corpus, batch, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the batch side broadcasts: corpus buckets must never sort-merge
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Length-bucketed batches
# ---------------------------------------------------------------------------


def test_length_batches_layout_and_waste(spark):
    d = _docs(spark).select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    out = length_bucketed_batches(
        d, "doc_id", "n_tok", batch_size=8, granularity=64
    ).collect()
    n_docs_total = sum(r["n_docs"] for r in out)
    assert n_docs_total == d.count()  # every doc lands in exactly one batch
    for r in out:
        assert 1 <= r["n_docs"] <= 8
        assert r["padded_tokens"] == r["n_docs"] * r["max_len"]
        assert r["pad_waste"] == r["padded_tokens"] - r["sum_len"]
        # bucket invariant: batch max fits the bucket's padded length
        assert r["max_len"] <= r["bucket"] * 64
    # longest-first batching: per bucket, batch 0 has the largest max_len
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["batch_id"])
        maxes = [r["max_len"] for r in rows]
        assert maxes == sorted(maxes, reverse=True)


def test_length_batches_waste_beats_global_padding(spark):
    d = _docs(spark).select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    rows = length_bucketed_batches(d, "doc_id", "n_tok", 8, 64).collect()
    bucketed_padded = sum(r["padded_tokens"] for r in rows)
    stats = d.agg(
        F.max("n_tok").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    global_padded = stats["mx"] * stats["n"]  # pad everything to corpus max
    assert bucketed_padded <= global_padded


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_weights_rank_target_like_docs_higher(spark):
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # looks like the target
            (2, "xray yankee zulu"),  # does not
            (3, "alpha xray"),  # mixed
        ],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["avg_logratio"]
        for r in dsir_weights(pool, target, "doc_id", tokens).collect()
    }
    assert w[1] > w[3] > w[2]
    assert w[1] > 0 and w[2] < 0


def test_dsir_weights_partition_invariant(spark):
    d = _docs(spark)
    tgt = F.col("source").isin("src0", "src1")
    a = sorted(
        map(
            tuple,
            dsir_weights(d.filter(~tgt), d.filter(tgt), "doc_id", tokens)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dsir_weights(
                d.filter(~tgt).repartition(7),
                d.filter(tgt).repartition(3),
                "doc_id",
                tokens,
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# BPE hybrid trainer
# ---------------------------------------------------------------------------


def test_bpe_driver_and_distributed_paths_identical(spark):
    from iniz_exporters_spark.operators.lm import bpe_learn

    d = _docs(spark)
    fast = bpe_learn(d, "text", k=12, driver_vocab_max=200_000)
    slow = bpe_learn(
        d, "text", k=12, checkpoint_every=4, driver_vocab_max=None
    )
    assert fast == slow
    assert len(fast) == 12


# ---------------------------------------------------------------------------
# Containment
# ---------------------------------------------------------------------------


def test_containment_flags_embedded_quote_jaccard_misses(spark):
    from iniz_exporters_spark.operators.dedup import (
        containment_pairs,
        neardup_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog again and again"
    host_text = ("unrelated preamble text here. " * 10) + quote + (
        " trailing content of the host document. " * 10
    )
    probe = spark.createDataFrame(
        [(1, quote)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(2, host_text), (3, "совершенно другой текст " * 20)],
        "doc_id long, text string",
    )
    got = containment_pairs(corpus, probe, threshold=0.8).collect()
    assert [(r["probe_id"], r["host_id"]) for r in got] == [(1, 2)]
    assert got[0]["containment"] >= 0.99
    # symmetric Jaccard on the same pair is far below any dedup threshold
    both = probe.union(corpus)
    jacc = neardup_pairs(both, "doc_id", "text", threshold=0.3).collect()
    assert not [r for r in jacc if {r["id_a"], r["id_b"]} == {1, 2}]


def test_containment_threshold_integer_math(spark):
    from iniz_exporters_spark.operators.dedup import containment_pairs

    # probe with 10 distinct shingles, host shares exactly 8 -> 0.8 kept;
    # a second probe sharing 7 -> 0.7 dropped at threshold 0.8
    import string

    # build texts from disjoint 5-char blocks so shingle sets are controlled
    blocks = ["".join(c * 5 for c in pair) for pair in string.ascii_lowercase]
    probe_text = " ".join(blocks[:2])  # shingles from 2 blocks
    host_text = probe_text  # full containment
    probe = spark.createDataFrame(
        [(1, probe_text)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(2, host_text)], "doc_id long, text string"
    )
    got = containment_pairs(corpus, probe, threshold=0.8).collect()
    assert len(got) == 1 and got[0]["containment"] == 1.0


# ---------------------------------------------------------------------------
# PQ-ADC search
# ---------------------------------------------------------------------------


def test_pq_adc_matches_numpy_reference(spark):
    import numpy as np

    from iniz_exporters_spark.operators.clustering import (
        pq_adc_topk,
        pq_model,
    )

    e = _embs(spark)
    codes_df, books = pq_model(e, "vec_id", "embedding", 4, 16, 4, 2)
    codes = {
        r["vec_id"]: [r[f"code_{j}"] for j in range(4)]
        for r in codes_df.collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in e.collect()
    }
    qs = [(i, vecs[i].tolist()) for i in sorted(vecs)[:2]]
    got = pq_adc_topk(codes_df, books, qs, top_k=3).collect()
    assert {r["query_id"] for r in got} == {qs[0][0], qs[1][0]}
    # numpy re-derivation of every returned adc distance
    B = [np.array(b, dtype=np.float64) for b in books]  # m arrays (k, 16)
    for r in got:
        q = vecs[r["query_id"]]
        want = sum(
            float(((q[j * 16 : (j + 1) * 16] - B[j][codes[r["neighbor_id"]][j]]) ** 2).sum())
            for j in range(4)
        )
        assert abs(r["adc_dist"] - round(want, 6)) < 1e-9
    # ranking is by adc ascending within each query
    for qid in {r["query_id"] for r in got}:
        ds = [r["adc_dist"] for r in sorted(
            (x for x in got if x["query_id"] == qid), key=lambda x: x["rn"]
        )]
        assert ds == sorted(ds)


def test_pq_adc_scoring_reads_codes_not_vectors(spark):
    from iniz_exporters_spark.operators.clustering import (
        pq_adc_topk,
        pq_model,
    )

    e = _embs(spark)
    codes_df, books = pq_model(e, "vec_id", "embedding", 4, 16, 4, 2)
    qs = [(0, [0.0] * 64)]
    plan = (
        pq_adc_topk(codes_df, books, qs, top_k=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the scoring side of the plan must not touch the embedding column
    assert "embedding" not in plan.split("MapInPandas")[0]

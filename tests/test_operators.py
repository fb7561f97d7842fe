"""Operator unit tests: MySQL shims, as-of join, dedup detection on
synthetic near-duplicates, pruning, CSV sink.
"""

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from iniz_exporters_spark.functions.mysql import (
    mysql_cast_unsigned,
    mysql_group_concat,
    strip_newlines,
)
from iniz_exporters_spark.operators.asof import asof_join
from iniz_exporters_spark.operators.dedup import (
    dedup_exact,
    minhash_signatures,
    neardup_pairs,
    simhash_signatures,
)
from iniz_exporters_spark.operators.pruning import drop_all_empty_columns
from iniz_exporters_spark.operators.similarity import knn_bruteforce
from iniz_exporters_spark.sources.csv_sink import write_single_csv


def test_mysql_group_concat_distinct_order(spark):
    # DISTINCT on value, ORDER BY weight: min-weight-wins, value tiebreak
    df = spark.createDataFrame(
        [(1, "b", 3.0), (1, "a", 2.0), (1, "b", 1.0), (1, "c", 2.0), (1, None, 0.5)],
        "g long, v string, w double",
    )
    got = df.groupBy("g").agg(
        mysql_group_concat("v", "w", ";").alias("x")
    ).first()["x"]
    # b has min weight 1.0; a and c tie at 2.0 → value order a<c
    assert got == "b;a;c"


def test_mysql_group_concat_unordered_sorts(spark):
    df = spark.createDataFrame([(1, "z"), (1, "a"), (1, "z")], "g long, v string")
    got = df.groupBy("g").agg(mysql_group_concat("v", sep=",").alias("x")).first()["x"]
    assert got == "a,z"


def test_mysql_cast_unsigned(spark):
    df = spark.createDataFrame(
        [("123",), ("12ab",), ("abc",), ("",), (None,),
         (" 123",), ("+12",), ("\t 7x",), ("-5",)],
        "s string",
    )
    got = [r["n"] for r in df.select(mysql_cast_unsigned("s").alias("n")).collect()]
    # MySQL leading-digit semantics incl. leading whitespace and '+';
    # leading '-' pinned to 0 (not MySQL's unsigned wraparound).
    assert got == [123, 12, 0, 0, 0, 123, 12, 7, 0]


def test_strip_newlines(spark):
    df = spark.createDataFrame([("a\r\nb\nc",)], "s string")
    assert df.select(strip_newlines("s").alias("x")).first()["x"] == "abc"


def test_asof_forward_and_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 25, "L2"), (2, 5, "L3")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 8, "R8"), (1, 20, "R20"), (1, 30, "R30")],
        "k long, t long, rv string",
    )
    back = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_cols={"rv": "rv"},
        ).collect()
    }
    assert back == {"L1": "R8", "L2": "R20", "L3": None}
    fwd = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_cols={"rv": "rv"}, direction="forward",
        ).collect()
    }
    assert fwd == {"L1": "R20", "L2": "R30", "L3": None}


def test_neardup_detects_planted_duplicates(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "shuffles partitions across the cluster with adaptive execution"
    )
    near = base.replace("lazy", "sleepy")  # one-word edit → high jaccard
    other = (
        "completely different content about databases indexes transactions "
        "and write ahead logging in storage engines everywhere tonight"
    )
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)],  # 4 = exact dup of 1
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in neardup_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs

    deduped = dedup_exact(df, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in deduped.collect()) == [1, 2, 3]


def test_simhash_similar_texts_close(spark):
    a = "spark adaptive query execution rewrites plans at runtime"
    b = "spark adaptive query execution rewrites plans at midnight"
    c = "bananas oranges apples pears grapes melons kiwis"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    sig = {r["doc_id"]: r["simhash"] for r in
           simhash_signatures(df, "doc_id", "text").collect()}
    ham_ab = bin(sig[1] ^ sig[2]).count("1")
    ham_ac = bin(sig[1] ^ sig[3]).count("1")
    assert ham_ab < ham_ac


def test_knn_self_consistent(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn_bruteforce(df, df.filter(F.col("vec_id") == 1), top_k=3)
    ordered = [r["neighbor_id"] for r in got.orderBy("rn").collect()]
    assert ordered == [2, 3, 4]  # by descending cosine to [1,0,0,0]


def test_ann_chunked_kernel_matches_single_block(spark):
    """A hot bucket processed in many tiny chunks must emit exactly what the
    single-block path emits (the 100-TB memory bound cannot change results)."""
    import random

    from iniz_exporters_spark.operators.similarity import (
        ann_bucketed,
        cosine_neardup,
        ivf_flat_topk,
    )

    rng = random.Random(7)
    # all-positive leading dims → every vector lands in ONE sign bucket
    rows = [
        (i, [rng.uniform(0.1, 1.0) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def canon(res):
        return sorted(tuple(r) for r in res.collect())

    # chunk_cells=100 with n=60 → chunk of 1 row: 60 blocks vs 1 block
    assert canon(ann_bucketed(df, chunk_cells=100)) == canon(
        ann_bucketed(df, chunk_cells=10**9)
    )
    assert canon(cosine_neardup(df, threshold=0.9, chunk_cells=100)) == canon(
        cosine_neardup(df, threshold=0.9, chunk_cells=10**9)
    )
    assert canon(ivf_flat_topk(df, n_centroids=2, chunk_cells=100)) == canon(
        ivf_flat_topk(df, n_centroids=2, chunk_cells=10**9)
    )


def test_ann_hot_bucket_guard_raises(spark):
    from pyspark.errors import PySparkException

    from iniz_exporters_spark.operators.similarity import ann_bucketed

    rows = [(i, [0.5, 0.5, 0.5, 0.5]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(PySparkException, match="max_rows"):
        ann_bucketed(df, max_rows=5).collect()


def test_knn_broadcast_query_guard_raises(spark):
    """The brute-force paths are scale-safe only while the query set
    broadcasts — an oversized query side must fail loudly at plan-build
    time (naming the bucketed-ANN fix), not as an opaque executor OOM."""
    from iniz_exporters_spark.operators.similarity import hard_negatives

    rows = [(i, [0.5, 0.5, 0.5, 0.5]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(RuntimeError, match="max_queries"):
        knn_bruteforce(df, df, max_queries=5)
    with pytest.raises(RuntimeError, match="ann_bucketed"):
        hard_negatives(df, df, max_queries=5)
    # at or under the bound the guard passes through
    assert knn_bruteforce(df, df, top_k=1, max_queries=10).count() > 0


def test_knn_loo_query_routes_through_broadcast_guard(spark, monkeypatch):
    """VERDICT r11 #2: the LOO-accuracy registry query broadcasts the
    WHOLE corpus (every vector is a query under leave-one-out), so it
    must pass through the library's `_broadcast_guard` — pin the route so
    the unguarded n×n crossJoin cannot silently come back."""
    from iniz_exporters_spark.operators import similarity
    from iniz_exporters_spark.queries import REGISTRY

    def sentinel(queries, max_queries, what):
        raise RuntimeError(f"guard-sentinel:{what}:{max_queries}")

    monkeypatch.setattr(similarity, "_broadcast_guard", sentinel)
    with pytest.raises(
        RuntimeError, match="guard-sentinel:knn_loo_accuracy_q:20000"
    ):
        REGISTRY["knn_loo_accuracy_q"].fn(spark, "/root/testdata/sf0.001")


def test_drop_all_empty_columns(spark):
    df = spark.createDataFrame(
        [("u1", None, "x", ""), ("u2", None, "", "")],
        "uuid string, `Void/Retire` string, a string, b string",
    )
    out = drop_all_empty_columns(df, prefix_order=("uuid", "Void/Retire"))
    assert out.columns == ["uuid", "Void/Retire", "a"]


def test_write_single_csv(spark):
    df = spark.createDataFrame(
        [("u1", None, "x"), ("u2", "y", None)], "id string, a string, b string"
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.csv")
        write_single_csv(df.orderBy("id"), path, columns=["id", "b", "a"])
        with open(path) as f:
            lines = f.read().splitlines()
    assert lines[0] == "id,b,a"
    assert lines[1:] == ["u1,x,", "u2,,y"]


def test_arrow_kernels_match_catalyst_spec(spark):
    """The Arrow/numpy dedup kernels must produce bit-identical values to the
    pure-Catalyst expression builders (the executable spec), including the
    empty / shorter-than-k / non-ASCII edge cases."""
    from iniz_exporters_spark.operators.dedup import (
        minhash_signatures_expr,
        simhash_signatures_expr,
    )

    rows = [
        (1, ""),
        (2, "ab"),
        (3, "hello world hello"),
        (4, "Café né 北京 test"),
        (5, "xxxxyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert sorted(minhash_signatures(df, "doc_id", "text").collect()) == sorted(
        minhash_signatures_expr(df, "doc_id", "text").collect()
    )
    assert sorted(simhash_signatures(df, "doc_id", "text").collect()) == sorted(
        simhash_signatures_expr(df, "doc_id", "text").collect()
    )


def test_shingle_band_sets_matches_standalone_kernels(spark):
    """The fused shingle+band(+minhash) kernel must be bit-identical to
    the three standalone kernels it replaces, per column, including the
    empty / shorter-than-k / non-ASCII edge cases."""
    from iniz_exporters_spark.operators.dedup import (
        band_rows,
        buckets_from_shingle_sets,
        minhash_signatures,
        shingle_band_sets,
        shingle_sets,
    )

    rows = [
        (1, ""),
        (2, "ab"),
        (3, "hello world hello"),
        (4, "Café né 北京 test"),
        (5, "xxxxyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = shingle_band_sets(
        df, "doc_id", "text", k=5, num_perm=16, rows_per_band=4,
        with_minhash=True,
    )
    hs_ref = shingle_sets(df, "doc_id", "text", k=5)
    assert sorted(
        (r.doc_id, tuple(r.hs)) for r in base.select("doc_id", "hs").collect()
    ) == sorted((r.doc_id, tuple(r.hs)) for r in hs_ref.collect())
    bk_ref = buckets_from_shingle_sets(hs_ref, "doc_id", 16, 4)
    assert sorted(
        map(tuple, band_rows(base, "doc_id").collect())
    ) == sorted(map(tuple, bk_ref.collect()))
    mh_ref = minhash_signatures(df, "doc_id", "text", num_perm=16, k=5)
    fused_mh = base.select(
        "doc_id", F.posexplode("mins").alias("j", "minhash")
    )
    assert sorted(map(tuple, fused_mh.collect())) == sorted(
        map(tuple, mh_ref.collect())
    )


def test_salted_join_matches_plain_join(spark):
    from iniz_exporters_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, lv string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k long, rv string")
    plain = sorted(
        (r.k, r.lv, r.rv) for r in left.join(right, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, "k", buckets=4, how="left").collect()
    )
    assert salted == plain
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_text_stats_matches_expression_path(spark):
    """The one-pass Arrow kernel (text_stats) must be bit-identical to the
    pure-Catalyst scoring expressions it vectorizes, including empty /
    punctuation-only / non-English / tie-on-zero edge cases."""
    from iniz_exporters_spark.functions.text import (
        predict_lang,
        quality_score,
        text_stats,
        whitespace_token_count,
    )

    rows = [
        (1, ""),
        (2, "   "),
        (3, "!!! ??? ;;;"),
        (4, "the cat sat on the mat and it is a good mat"),
        (5, "el perro y la casa de los niños en un parque"),
        (6, "zzz qqq www"),
        (7, "la de " * 50),  # es/fr tie -> es by priority
        (8, "x" * 600),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = df.select(
        "doc_id",
        quality_score("text").alias("quality"),
        predict_lang("text").alias("lang_pred"),
        whitespace_token_count("text").alias("n_tokens"),
    )
    fast = text_stats(df, "doc_id", "text").select(
        "doc_id",
        F.round("quality_raw", 4).alias("quality"),
        "lang_pred",
        "n_tokens",
    )
    assert sorted(map(tuple, expr.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_interval_join_matches_naive(spark):
    """Bucketed interval join must equal the naive inequality join,
    including both band edges and cross-bucket pairs."""
    from datetime import datetime as dt

    from iniz_exporters_spark.operators.rangejoin import interval_join

    t0 = dt(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return dt(2024, 1, 1, 12, 0, 0).fromtimestamp(t0.timestamp() + sec)

    left = spark.createDataFrame(
        [(1, 10, at(1000)), (2, 10, at(100)), (3, 20, at(1000))],
        "lid long, k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, at(400)),   # exactly l - lower for lid=1 → included
            (102, 10, at(999)),   # just before l → included
            (103, 10, at(1000)),  # == l → excluded (strict upper)
            (104, 10, at(399)),   # just outside band → excluded
            (105, 20, at(500)),   # matches lid=3 only (key isolation)
            (106, 99, at(900)),   # no key match
        ],
        "rid long, k long, rt timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            left, right, keys=["k"], left_time="lt", right_time="rt",
            lower_seconds=600,
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right,
            (left.k == right.k)
            & (right.rt >= left.lt - F.expr("INTERVAL 600 SECOND"))
            & (right.rt < left.lt),
        ).collect()
    )
    assert got == naive
    assert (1, 101) in got and (1, 102) in got and (3, 105) in got
    assert (1, 103) not in got and (1, 104) not in got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join(left, right, ["k"], "lt", "rt", 10, upper_seconds=10)


def test_band_lookup_join_edges(spark):
    from iniz_exporters_spark.operators.rangejoin import band_lookup_join

    fact = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 25.0), (5, 50.0), (6, -1.0)],
        "fid long, v double",
    )
    bands = [("low", 0.0, 10.0), ("high", 10.0, 50.0)]
    got = {
        r.fid: r.band
        for r in band_lookup_join(fact, "v", bands).collect()
    }
    # lo inclusive, hi exclusive; out-of-band rows dropped
    assert got == {1: "low", 2: "low", 3: "high", 4: "high"}


def test_ngram_jaccard_exact_recall_vs_bruteforce(spark):
    """Prefix filtering must find EVERY pair with Jaccard >= t (the
    AllPairs guarantee) — verified against an O(n²) brute force over the
    first 60 sf0.001 documents."""
    import itertools
    import re

    from conftest import SF_SMALL
    from iniz_exporters_spark.operators.dedup import ngram_jaccard_pairs

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter("doc_id < 60")
        .select("doc_id", "text")
    )
    rows = docs.collect()

    def gset(text, n=3):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        hs = []
        for t in toks:
            h = 0
            for c in t:
                h = (h * 31 + ord(c)) % 1000000007
            hs.append(h)
        out = set()
        for i in range(len(hs) - n + 1):
            g = 0
            for h in hs[i : i + n]:
                g = (g * 1000003 + h) % 1000000007
            out.add(g)
        return out

    sets = {r["doc_id"]: gset(r["text"]) for r in rows}
    expected = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.6:
            expected[(a, b)] = round(j, 4)

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    }
    assert got == expected
    assert expected, "sample must contain at least one qualifying pair"


def test_ngram_jaccard_planted(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("theta", "thorn")
    other = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base), (5, "too short")],
        "doc_id long, text string",
    )
    from iniz_exporters_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert not any(3 in p or 5 in p for p in pairs)


def test_kmeans_lloyd_separable_blobs(spark):
    """Three well-separated blobs must cluster together after 2 rounds,
    whatever the (deterministic) cluster labels are; k > distinct points
    that can fill clusters raises loudly instead of silently degenerating."""
    from iniz_exporters_spark.operators.clustering import kmeans_lloyd

    # ids interleaved across blobs so the deterministic k-lowest-id init
    # (ids 0,1,2) seeds one centroid per blob
    blobs = []
    for b, center in enumerate([0.0, 10.0, 20.0]):
        for i in range(5):
            blobs.append((b + 3 * i, [center + 0.1 * i, center - 0.1 * i]))
    df = spark.createDataFrame(blobs, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_lloyd(df, k=3, iters=3).collect()}
    labels = [{got[b + 3 * i] for i in range(5)} for b in range(3)]
    assert all(len(s) == 1 for s in labels)  # each blob single-labeled
    assert len(set().union(*labels)) == 3  # blobs in distinct clusters

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="fewer than k"):
        kmeans_lloyd(df.limit(2), k=3)


def test_chunk_tokens_windows(spark):
    from iniz_exporters_spark.functions.text import chunk_tokens

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "only three tokens"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"], r["n_chunk_tokens"])
        for r in chunk_tokens(df, "doc_id", "text", size=4, overlap=1).collect()
    )
    # doc 1: 10 tokens, windows of 4 every 3: starts 1,4,7 (<= n-overlap=9)
    doc1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in doc1] == [0, 1, 2]
    assert doc1[0][2] == "w0 w1 w2 w3" and doc1[2][2] == "w6 w7 w8 w9"
    assert [r[3] for r in doc1] == [4, 4, 4]
    # doc 2: 3 tokens <= size → single truncated window
    doc2 = [r for r in rows if r[0] == 2]
    assert doc2 == [(2, 0, "only three tokens", 3)]
    # doc 3: token-less text → one empty chunk (documented contract)
    assert [r for r in rows if r[0] == 3] == [(3, 0, "", 0)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, "doc_id", "text", size=4, overlap=4)


def test_ivf_multiprobe_improves_recall(spark):
    """nprobe=2 must recover at least the nprobe=1 recall vs brute force,
    and nprobe=1 must equal the original single-probe results."""
    from iniz_exporters_spark.operators.similarity import (
        ivf_flat_topk,
        knn_bruteforce,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, emb, top_k=3).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_flat_topk(emb, n_centroids=8, top_k=3,
                                   nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    # the synthetic embeddings are near-uniform (pairwise cosine tops out
    # ~0.5), so cells barely capture neighborhoods — recall is structurally
    # low here; the contract is monotone improvement plus a sanity floor
    assert r2 >= 0.3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="nprobe"):
        ivf_flat_topk(emb, n_centroids=4, nprobe=5)


def test_ann_auto_split_rebuckets_hot_buckets(spark):
    """With auto_split_bits, a bucket over max_rows is re-bucketed by
    further sign dims instead of raising; results are a subset of the
    unsplit candidates and cold buckets are untouched."""
    import random

    from iniz_exporters_spark.operators.similarity import ann_bucketed

    rng = random.Random(3)
    # dims 0-3 all positive → one hot bucket of 40; sign of dims 4-5 varies
    rows = [
        (i, [rng.uniform(0.1, 1.0)] * 4
         + [rng.uniform(-1.0, 1.0), rng.uniform(-1.0, 1.0)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def canon(res):
        return sorted(tuple(r) for r in res.collect())

    # every vector is in ONE hot bucket, so splitting it by 2 further sign
    # dims is exactly a bits=6 bucketing — results must match it, and the
    # guard must NOT fire (it would without the split)
    split = canon(ann_bucketed(df, bits=4, max_rows=20, auto_split_bits=2))
    assert split == canon(ann_bucketed(df, bits=6))
    assert split

    # identical vectors cannot be split further → guard still fires
    from pyspark.errors import PySparkException

    same = spark.createDataFrame(
        [(i, [0.5] * 6) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PySparkException, match="max_rows"):
        ann_bucketed(same, bits=4, max_rows=5, auto_split_bits=2).collect()


def test_cosine_neardup_auto_split_rebuckets_hot_buckets(spark):
    """auto_split_bits on cosine_neardup: hot buckets re-bucket by further
    sign dims instead of raising; result equals the finer bucketing, and
    identical vectors (unsplittable) still hit the loud guard."""
    import random

    from iniz_exporters_spark.operators.similarity import cosine_neardup

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(0.1, 1.0)] * 4
         + [rng.uniform(-1.0, 1.0), rng.uniform(-1.0, 1.0)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def canon(res):
        return sorted(tuple(r) for r in res.collect())

    split = canon(
        cosine_neardup(
            df, bits=4, threshold=0.5, max_rows=20, auto_split_bits=2
        )
    )
    assert split == canon(cosine_neardup(df, bits=6, threshold=0.5))
    assert split

    from pyspark.errors import PySparkException

    same = spark.createDataFrame(
        [(i, [0.5] * 6) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PySparkException, match="max_rows"):
        cosine_neardup(same, bits=4, max_rows=5, auto_split_bits=2).collect()


def test_semdedup_auto_split_degrades_gracefully(spark):
    """auto_split_bits on semdedup: a cluster over max_rows is sub-divided
    by sign dims instead of raising. Priors are then sought within the
    sub-cluster only, so the kept set can only GROW vs the unsplit run,
    and the reported cluster id stays the original k-means id."""
    import random

    from iniz_exporters_spark.operators.semdedup import semdedup

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(6)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    full = {r["vec_id"]: r for r in semdedup(df, k=2, tau=0.5).collect()}
    # k=2 over 30 rows → at least one cluster exceeds max_rows=10
    split = {
        r["vec_id"]: r
        for r in semdedup(
            df, k=2, tau=0.5, max_rows=10, auto_split_bits=2
        ).collect()
    }
    assert set(split) == set(full)
    kept_full = {i for i, r in full.items() if r["kept"]}
    kept_split = {i for i, r in split.items() if r["kept"]}
    assert kept_full <= kept_split
    # cluster ids survive the sub-division
    assert all(split[i]["cluster"] == full[i]["cluster"] for i in split)

    from pyspark.errors import PySparkException

    same = spark.createDataFrame(
        [(i, [0.5] * 6) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PySparkException, match="max_rows"):
        semdedup(same, k=1, max_rows=5, auto_split_bits=2).collect()


def test_pagerank_tiny_graph(spark):
    # star: a -> b, a -> c, b -> c ; c dangles.
    # iter1: r(a)=0.15; r(b)=0.15+0.85*(1/2)=0.575; r(c)=0.15+0.85*(1/2+1/1)=1.425
    # iter2: r(a)=0.15; r(b)=0.15+0.85*(0.15/2)=0.21375
    #        r(c)=0.15+0.85*(0.15/2 + 0.575)=0.70250
    from iniz_exporters_spark.plans.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=2).collect()}
    assert got == {"a": 0.15, "b": 0.21375, "c": 0.7025}


def test_pagerank_mass_conservation_on_cycle(spark):
    # on a pure cycle every node keeps rank exactly 1.0 at every iteration
    from iniz_exporters_spark.plans.graph import pagerank

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(cyc, iters=3).collect()}
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_resample_interpolate_fills_gap_linearly(spark):
    from iniz_exporters_spark.operators.timeseries import resample_interpolate

    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:50:00", 20.0),  # hour 0 observed mean = 15.0
        (1, "2024-01-01 03:00:00", 45.0),  # hours 1,2 are gaps
        (2, "2024-01-01 05:00:00", 7.0),   # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["key"], str(r["bucket"])): (r["observed"], r["value"])
        for r in resample_interpolate(df).collect()
    }
    assert out[(1, "2024-01-01 00:00:00")] == (15.0, 15.0)
    # linear ramp 15 -> 45 over 3 hours: 25 at +1h, 35 at +2h
    assert out[(1, "2024-01-01 01:00:00")] == (None, 25.0)
    assert out[(1, "2024-01-01 02:00:00")] == (None, 35.0)
    assert out[(1, "2024-01-01 03:00:00")] == (45.0, 45.0)
    assert out[(2, "2024-01-01 05:00:00")] == (7.0, 7.0)
    assert len(out) == 5


def test_bm25_ranks_rarer_term_higher(spark):
    from iniz_exporters_spark.operators.ranking import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "rare common common filler words here"),
            (2, "common filler words again and again"),
            (3, "common words more filler text body"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["rare", "common"]).collect()}
    assert set(got) == {1, 2, 3}
    # doc 1 holds the only 'rare' hit -> strictly top score
    assert got[1]["bm25"] > got[2]["bm25"]
    assert got[1]["bm25"] > got[3]["bm25"]
    assert got[1]["n_hits"] == 2  # matched both query terms


def test_sessionize_splits_on_gap(spark):
    from iniz_exporters_spark.operators.cohorts import sessionize

    rows = [
        (1, 101, "2024-01-01 00:00:00"),
        (1, 102, "2024-01-01 00:10:00"),   # same session (10 min gap)
        (1, 103, "2024-01-01 01:00:00"),   # new session (50 min gap)
        (2, 201, "2024-01-01 00:00:00"),   # other user: own session
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r["user_id"], r["session_seq"]): (
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
        )
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): ("2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        (1, 2): ("2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
        (2, 1): ("2024-01-01 00:00:00", "2024-01-01 00:00:00", 1),
    }


def test_cohort_retention_offsets(spark):
    from iniz_exporters_spark.operators.cohorts import cohort_retention

    rows = [
        (1, "2024-01-01 12:00:00"),  # Mon wk0
        (1, "2024-01-09 12:00:00"),  # wk1
        (2, "2024-01-02 12:00:00"),  # wk0 cohort, only wk0 activity
        (3, "2024-01-10 12:00:00"),  # wk1 cohort
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_time_to_convert_first_purchase_after_signup(spark):
    from iniz_exporters_spark.operators.cohorts import time_to_convert

    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "purchase", "2023-12-31 00:00:00"),  # before signup: ignored
        (1, "purchase", "2024-01-01 00:30:00"),  # first valid: 1800s
        (1, "purchase", "2024-01-02 00:00:00"),
        (2, "signup", "2024-01-01 00:00:00"),    # never converts -> NULL
        (3, "purchase", "2024-01-01 00:00:00"),  # never signs up -> dropped
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["user_id"]: r["convert_secs"]
        for r in time_to_convert(df).collect()
    }
    assert got == {1: 1800, 2: None}


def test_hash_split_deterministic_and_stable_under_append(spark):
    from iniz_exporters_spark.operators.sampling import hash_split

    base = spark.range(0, 200).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["k"]: r["split"] for r in hash_split(base, "k", fr).collect()}
    # same rows -> same labels on rerun
    b = {r["k"]: r["split"] for r in hash_split(base, "k", fr).collect()}
    assert a == b
    # appending data never moves an existing row's split
    bigger = spark.range(0, 400).withColumnRenamed("id", "k")
    c = {r["k"]: r["split"] for r in hash_split(bigger, "k", fr).collect()}
    assert all(c[k] == v for k, v in a.items())
    # rough proportions hold
    n_train = sum(1 for v in a.values() if v == "train")
    assert 120 <= n_train <= 190


def test_apply_changes_upsert_delete_insert(spark):
    from iniz_exporters_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U", 1),
            (2, "ignored", "U", 0),   # older seq loses
            (3, "c", "D", 1),          # delete
            (4, "d", "I", 1),          # insert
        ],
        ["k", "v", "op", "seq"],
    )
    got = {r["k"]: r["v"] for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_apply_changes_same_seq_delete_wins(spark):
    from iniz_exporters_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, "a2", "U", 5), (1, "a2", "D", 5)], ["k", "v", "op", "seq"]
    )
    got = apply_changes(base, changes, ["k"]).collect()
    assert got == []


def test_zorder_interleave_arithmetic(spark):
    """z(1,0)=1 (bit 0), z(0,1)=2 (bit 1), z(3,3)=15, z(2^15,2^15) tops out
    at bits 30+31 — the full 16-bit interleave is exercised end to end."""
    from iniz_exporters_spark.queries import _zorder16

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (1 << 15, 1 << 15), (0, 0)], ["a", "b"]
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", _zorder16(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got == {
        (1, 0): 1,
        (0, 1): 2,
        (3, 3): 15,
        (1 << 15, 1 << 15): (1 << 30) + (1 << 31),
        (0, 0): 0,
    }


def test_check_expectations_single_pass_and_verdicts(spark):
    from iniz_exporters_spark.operators.quality import (
        Expectation,
        check_expectations,
        null_rate,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y"), (4, "y")], ["k", "v"]
    )
    rules = [
        Expectation("v_null_rate", null_rate("v"), 0.0, 0.1),  # fails: 0.25
        Expectation("n_rows", F.count(F.lit(1)), 1.0, 100.0),  # passes
    ]
    rep = check_expectations(df, rules)
    got = {r["rule"]: (r["observed"], r["passed"]) for r in rep.collect()}
    assert got["v_null_rate"] == (0.25, False)
    assert got["n_rows"] == (4.0, True)
    # one aggregation over one scan feeds the whole report
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") <= 2 * len(rules)


def test_weighted_sample_favors_heavy_rows_deterministically(spark):
    from iniz_exporters_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 1 + (i % 7) * 1000) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "w"])
    a = [r["k"] for r in weighted_sample_topk(df, "k", "w", 25).collect()]
    b = [r["k"] for r in weighted_sample_topk(df, "k", "w", 25).collect()]
    assert a == b  # hash-derived draws: no RNG, stable across runs
    # heavy rows (w>=1001) should dominate the sample over w=1 rows
    heavy = sum(1 for k in a if k % 7 != 0)
    assert heavy >= 20


def test_pq_encode_reconstruction_beats_random_codes(spark):
    """PQ codes must be informative: per-subspace centroid reconstruction
    error of the TRUE code is <= that of any other code (by argmin
    construction), checked on a small deterministic corpus."""
    from iniz_exporters_spark.operators.clustering import pq_encode

    rng = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rng, ["vec_id", "embedding"])
    codes = pq_encode(df, m=2, subdim=4, k=3, iters=2).collect()
    assert len(codes) == 40
    by_id = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in codes}
    # codes are within range and not all identical (clustering happened)
    assert all(0 <= c < 3 for pair in by_id.values() for c in pair)
    assert len(set(by_id.values())) > 1
    # determinism across reruns
    again = {
        r["vec_id"]: (r["code_0"], r["code_1"])
        for r in pq_encode(df, m=2, subdim=4, k=3, iters=2).collect()
    }
    assert again == by_id


def test_bpe_apply_symbols_iterative_merges(spark):
    """Rank-order application with a rule consuming an earlier rule's
    output: 'theater' under [(t,h), (th,e)] → [the, a, t, e, r]."""
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.lm import bpe_apply_symbols

    df = spark.createDataFrame([("theater",), ("nothing",)], ["w"])
    got = {
        r["w"]: r["syms"]
        for r in df.select(
            "w",
            bpe_apply_symbols(
                F.col("w"), [("t", "h"), ("th", "e")]
            ).alias("syms"),
        ).collect()
    }
    assert got["theater"] == ["the", "a", "t", "e", "r"]
    assert got["nothing"] == ["n", "o", "th", "i", "n", "g"]
    # adjacent same-pair runs merge leftmost-first: 'hhh' + (h,h) → [hh, h]
    run = spark.createDataFrame([("hhh",)], ["w"]).select(
        bpe_apply_symbols(F.col("w"), [("h", "h")]).alias("s")
    )
    assert run.first()["s"] == ["hh", "h"]


def test_bpe_learn_trains_expected_merges(spark):
    """Hand-computed: corpus 'the then the' → vocab the(2), then(1).
    Round 1: (h,e) and (t,h) tie at 3, pair-asc tiebreak picks (h,e);
    round 2: (t,he)=3; round 3: (the,n)=1; round 4: no pairs left."""
    from iniz_exporters_spark.operators.lm import (
        bpe_apply_symbols,
        bpe_learn,
    )

    df = spark.createDataFrame([("the then the",)], ["text"])
    merges = bpe_learn(df, "text", k=4)
    assert merges == [("h", "e"), ("t", "he"), ("the", "n")]

    # applying the learned table re-derives whole-word tokens
    import pyspark.sql.functions as F

    words = spark.createDataFrame([("then",), ("the",)], ["w"])
    got = {
        r["w"]: r["s"]
        for r in words.select(
            "w", bpe_apply_symbols(F.col("w"), merges).alias("s")
        ).collect()
    }
    assert got["then"] == ["then"]
    assert got["the"] == ["the"]


def test_write_merged_csv_matches_coalesce_bytes(spark):
    """The streamed part-merge scale path must produce byte-identical
    output to the coalesce(1) path for a total ordering, at any partition
    count — including partitions that end up empty."""
    import os
    import tempfile

    from iniz_exporters_spark.sources.csv_sink import (
        write_merged_csv,
        write_single_csv,
    )

    df = spark.createDataFrame(
        [(i, f"name{i % 7}", None if i % 5 == 0 else f"v{i}")
         for i in range(200)],
        "id long, name string, val string",
    )
    with tempfile.TemporaryDirectory() as d:
        a, b = os.path.join(d, "a.csv"), os.path.join(d, "b.csv")
        write_single_csv(df.orderBy("id"), a)
        write_merged_csv(df, b, order_by=["id"], partitions=8)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()
        # more partitions than rows → empty parts must not corrupt output
        c = os.path.join(d, "c.csv")
        write_merged_csv(df.limit(3).orderBy("id"), c,
                         order_by=["id"], partitions=16)
        with open(c) as f:
            assert len(f.read().splitlines()) == 4  # header + 3 rows

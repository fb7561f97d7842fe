"""Unit contracts for the round-2 training-pipeline operators: PII
redaction, Unicode normalization, char entropy, distributed dense index,
negative sampling, per-group reservoir, hard negatives, skew profile."""

import math

import pyspark.sql.functions as F
import pytest

from iniz_exporters_spark.functions.text import char_entropy, normalize_text
from iniz_exporters_spark.operators.indexing import (
    global_index,
    negative_sample_pairs,
)
from iniz_exporters_spark.operators.privacy import pii_counts, redact_pii
from iniz_exporters_spark.operators.sampling import reservoir_per_group
from iniz_exporters_spark.operators.similarity import hard_negatives
from iniz_exporters_spark.operators.skew import key_skew_profile


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo.io or call 555-123-4567 from 10.0.0.1"),
            (2, "ssn 123-45-6789 plain text"),
            (3, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            *[c.alias(k) for k, c in pii_counts("t").items()],
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> or call <PHONE> from <IP>"
    assert out[1]["email"] == 1 and out[1]["phone"] == 1 and out[1]["ipv4"] == 1
    assert out[2]["red"] == "ssn <SSN> plain text"
    assert out[2]["ssn"] == 1 and out[2]["email"] == 0
    assert out[3]["red"] == "nothing sensitive here"


def test_redact_pii_ssn_not_phone(spark):
    # 3-2-4 digit groups are SSN-shaped, not phone-shaped
    df = spark.createDataFrame([(1, "id 987-65-4321")], "id long, t string")
    r = df.select(redact_pii("t").alias("red")).first()
    assert r["red"] == "id <SSN>"


def test_normalize_text_nfc_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\t\tWORLD  café  "), (2, "")],
        "id long, t string",
    )
    rows = {r["id"]: r for r in normalize_text(df, "id", "t").collect()}
    assert rows[1]["norm_text"] == "hello world café"
    assert rows[1]["n_chars_after"] == len("hello world café")
    assert rows[2]["norm_text"] == "" and rows[2]["n_chars_after"] == 0


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aabb"), (3, "abcd"), (4, "")],
        "id long, t string",
    )
    rows = {r["id"]: r for r in char_entropy(df, "id", "t").collect()}
    assert rows[1]["char_entropy"] == 0.0
    assert math.isclose(rows[2]["char_entropy"], 1.0)
    assert math.isclose(rows[3]["char_entropy"], 2.0)
    assert rows[4]["char_entropy"] == 0.0 and rows[4]["n_chars"] == 0


def test_global_index_is_dense_rank(spark):
    ids = [9, 3, 27, 1, 100, 42, 7]
    df = spark.createDataFrame([(i,) for i in ids], "k long").repartition(4)
    got = {
        r["k"]: r["idx"] for r in global_index(df, "k").collect()
    }
    expected = {k: i + 1 for i, k in enumerate(sorted(ids))}
    assert got == expected


def test_negative_samples_never_self_and_exact_k(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = negative_sample_pairs(df, "doc_id", k=3, seed=7).collect()
    assert len(out) == 60
    for r in out:
        assert r["negative_id"] != r["anchor_id"]
        assert 0 <= r["negative_id"] < 20
    # deterministic across reruns
    again = negative_sample_pairs(df, "doc_id", k=3, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_rejects_tiny_input(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="needs >= 2 rows"):
        negative_sample_pairs(df, "doc_id")


def test_reservoir_per_group_exact_k(spark):
    rows = [(g, g * 100 + i) for g in range(3) for i in range(10)]
    rows += [(9, 901)]  # group smaller than k
    df = spark.createDataFrame(rows, "g int, k long")
    out = reservoir_per_group(df, "g", "k", k=4).collect()
    sizes = {}
    for r in out:
        sizes[r["g"]] = sizes.get(r["g"], 0) + 1
        assert r["rn"] <= 4
    assert sizes == {0: 4, 1: 4, 2: 4, 9: 1}


def test_hard_negatives_band_and_k(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.02]),  # cos ~0.9998 → above band, excluded
            (2, [1.0, 1.0]),  # cos ~0.7071 → in band
            (3, [0.0, 1.0]),  # cos 0 → below band
            (4, [1.0, 2.0]),  # cos ~0.4472 → in band
        ],
        "vec_id long, embedding array<float>",
    )
    out = hard_negatives(
        df, df.filter(F.col("vec_id") == 0), lo=0.2, hi=0.9, top_k=5
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert got == {(0, 2), (0, 4)}
    for r in out:
        assert 0.2 <= r["cos"] < 0.9


def test_key_skew_profile_orders_and_share(spark):
    rows = [("hot", i) for i in range(8)] + [("a", 0), ("b", 0), ("c", 0)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = key_skew_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in out] == ["hot", "a"]
    top = out[0]
    assert top["cnt"] == 8 and top["rn"] == 1
    assert math.isclose(top["share"], round(8 / 11, 4))
    # 4 distinct keys, mean group size 11/4 → ratio 8/(11/4)
    assert math.isclose(top["skew_ratio"], round(8 * 4 / 11, 4))


# --- semdedup / quality classifier / deterministic shuffle ------------------


def test_semdedup_keeps_lowest_id_and_flags_dropped(spark):
    from iniz_exporters_spark.operators.semdedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semdedup(emb, "vec_id", "embedding", k=4, iters=2, tau=0.4)
    rows = out.collect()
    assert len(rows) == emb.count()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 4
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        # a cluster's lowest id has no prior rows: always kept, NULL cos
        assert lowest["kept"] and lowest["max_prior_cos"] is None
        for r in members:
            if r["vec_id"] != lowest["vec_id"]:
                assert r["max_prior_cos"] is not None
            assert r["kept"] == (
                r["max_prior_cos"] is None or r["max_prior_cos"] < 0.4
            )
    # tau at ~p90 of within-cluster cosine: both classes non-empty
    kept = [r for r in rows if r["kept"]]
    assert 0 < len(kept) < len(rows)


def test_semdedup_chunked_matches_unchunked(spark):
    from iniz_exporters_spark.operators.semdedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = semdedup(emb, k=2, iters=1, tau=0.4)
    tiny = semdedup(emb, k=2, iters=1, tau=0.4, chunk_cells=7)
    assert sorted(map(tuple, big.collect())) == sorted(
        map(tuple, tiny.collect())
    )


def test_linear_quality_score_empty_text_is_half(spark):
    from iniz_exporters_spark.operators.quality import linear_quality_score

    df = spark.createDataFrame([("",), ("...",), ("hello world",)], ["text"])
    got = df.select(linear_quality_score("text").alias("p")).collect()
    assert got[0]["p"] == 0.5  # no tokens -> raw 0 -> sigmoid(0)
    assert got[1]["p"] == 0.5  # punctuation-only tokenizes to nothing
    assert 0.0 <= got[2]["p"] <= 1.0


def test_deterministic_shuffle_is_layout_independent(spark):
    from iniz_exporters_spark.operators.sampling import (
        deterministic_shuffle,
        shuffle_key,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = deterministic_shuffle(d, "doc_id", seed="s1", partitions=4)
    b = deterministic_shuffle(d.repartition(13), "doc_id", seed="s1", partitions=4)
    ids_a = [r["doc_id"] for r in a.select("doc_id").toLocalIterator()]
    ids_b = [r["doc_id"] for r in b.select("doc_id").toLocalIterator()]
    assert ids_a == ids_b  # same order regardless of input layout
    # and it matches the key's global sort order
    want = [
        r["doc_id"]
        for r in d.select("doc_id", shuffle_key("doc_id", "s1").alias("k"))
        .orderBy("k", "doc_id")
        .collect()
    ]
    # rows with equal keys can't exist (md5 of distinct ids); strict equality
    assert ids_a == want
    # different seed -> different order
    c = deterministic_shuffle(d, "doc_id", seed="s2", partitions=4)
    assert [r["doc_id"] for r in c.select("doc_id").toLocalIterator()] != want


def test_apex_domain_edges(spark):
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.webcorpus import apex_domain

    df = spark.createDataFrame(
        [
            ("www.news.example.com",),
            ("example.com",),
            ("localhost",),
            ("shop.example.co.uk",),   # PSL multi-label suffix
            ("example.co.uk",),
            ("co.uk",),                # bare suffix: only 2 labels, passes
        ],
        ["h"],
    )
    got = [r["a"] for r in
           df.select(apex_domain(F.col("h")).alias("a")).collect()]
    assert got == [
        "example.com", "example.com", "localhost",
        "example.co.uk", "example.co.uk", "co.uk",
    ]


def test_host_rate_sample_keeps_small_hosts_whole(spark):
    """Hosts at or under the target keep every row; big hosts shrink to a
    deterministic ~target subset, identical across reruns/partitionings."""
    from iniz_exporters_spark.operators.webcorpus import host_rate_sample

    rows = [(i, "big.com") for i in range(200)] + [
        (1000 + i, "small.com") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    kept = host_rate_sample(df, "host", "doc_id", target=5)
    by_host = {
        r["host"]: r["n"]
        for r in kept.groupBy("host").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert by_host["small.com"] == 3  # under target → untouched
    assert 0 < by_host.get("big.com", 0) < 25  # ~5 expected, bounded
    again = host_rate_sample(df.repartition(13), "host", "doc_id", target=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_gopher_quality_rules(spark):
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.curation import gopher_quality

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then naps"),
        (2, "1 2 3 4 5 6 7 8 9 10 11 12"),  # no alpha words, no stopwords
        (3, "to be"),  # under min_words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *gopher_quality(F.col("text"))
        ).collect()
    }
    assert got[1]["keep"] is True
    assert got[1]["n_stopwords"] == 2  # 'the', 'and'
    assert got[2]["keep"] is False  # frac_alpha 0.0, no stopwords
    assert got[2]["frac_alpha_words"] == 0.0
    assert got[3]["keep"] is False  # 2 words < min 10
    assert got[3]["n_words"] == 2


def test_oov_rate_against_vocab(spark):
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.curation import (
        oov_rate,
        top_k_vocab,
    )

    toks = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "x"), (1, "y"), (2, "a"), (2, "b")],
        "doc_id long, tok string",
    )
    vocab = top_k_vocab(toks, "tok", 2)  # 'a'(3) and 'b'(1) — b beats x,y
    assert sorted(r["tok"] for r in vocab.collect()) == ["a", "b"]
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_rate"])
        for r in oov_rate(toks, "doc_id", "tok", vocab).collect()
    }
    assert got[1] == (4, 0.5)  # x, y of 4 are OOV
    assert got[2] == (2, 0.0)


def test_deterministic_shuffle_rejects_skey_collision(spark):
    import pytest as _pytest

    from iniz_exporters_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(1, "x")], "doc_id long, __skey string")
    with _pytest.raises(ValueError, match="__skey"):
        deterministic_shuffle(df, "doc_id")


def test_canonicalize_url_edges(spark):
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.webcorpus import canonicalize_url

    rows = [
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&ref=1",),
        ("http://ex.com/",),              # trailing slash, no query
        ("https://ex.com/p?utm_a=1&utm_b=2",),  # all params dropped
    ]
    df = spark.createDataFrame(rows, ["u"])
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [
        "https://www.ex.com/a/b?ref=1",
        "https://ex.com",
        "https://ex.com/p",
    ]


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile must reproduce ANSI NTILE bit-for-bit (including the
    ceil-sized leading buckets when N % n != 0) for asc, desc, and
    fewer-rows-than-buckets shapes — it replaces the single-partition
    global window in rfm_segment_q / quantile_bins (VERDICT r5 #7)."""
    import random

    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import global_ntile

    rng = random.Random(13)
    rows = [(i, rng.randrange(50)) for i in range(103)]  # 103 % 4 == 3
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    for n_buckets, sort_cols, wspec in [
        (4, [F.col("v"), F.col("k")], Window.orderBy("v", "k")),
        (10, [F.col("v").desc(), F.col("k")], Window.orderBy(F.desc("v"), "k")),
    ]:
        got = {
            r["k"]: r["b"]
            for r in global_ntile(df, sort_cols, n_buckets, "b").collect()
        }
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k", F.ntile(n_buckets).over(wspec).cast("long").alias("b")
            ).collect()
        }
        assert got == want
    # fewer rows than buckets: bucket == rank
    tiny = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = {
        r["k"]: r["b"]
        for r in global_ntile(tiny, [F.col("k")], 5, "b").collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_grouped_ntile_matches_window_ntile(spark):
    """grouped_ntile must reproduce partitioned ANSI NTILE bit-for-bit,
    including skewed group sizes and N % n != 0 buckets."""
    import random

    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import grouped_ntile

    rng = random.Random(7)
    rows = []
    k = 0
    for g, size in (("a", 17), ("b", 3), ("c", 40), ("d", 1), ("e", 9)):
        for _ in range(size):
            rows.append((g, k, rng.randrange(20)))
            k += 1
    df = spark.createDataFrame(rows, "g string, k long, v long").repartition(5)
    got = {
        r["k"]: r["b"]
        for r in grouped_ntile(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], 3, "b"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    want = {
        r["k"]: r["b"]
        for r in df.select(
            "k", F.ntile(3).over(w).cast("long").alias("b")
        ).collect()
    }
    assert got == want


def test_grouped_ntile_rejects_null_group_keys(spark):
    import pytest

    from iniz_exporters_spark.operators.indexing import grouped_ntile

    df = spark.createDataFrame(
        [("a", 1, 5), (None, 2, 6)], "g string, k long, v long"
    )
    with pytest.raises(ValueError, match="NULL group key"):
        grouped_ntile(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], 2, "b"
        ).collect()


def test_grouped_index_matches_window_rank(spark):
    """grouped_index must reproduce ROW_NUMBER + COUNT OVER (PARTITION BY
    g) bit-for-bit, including skewed group sizes — it replaces the
    per-stratum corpus-scale window in stratified_split_q."""
    import random

    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import grouped_index

    rng = random.Random(11)
    rows = []
    k = 0
    for g, size in (("a", 23), ("b", 1), ("c", 57), ("d", 6)):
        for _ in range(size):
            rows.append((g, k, rng.randrange(15)))
            k += 1
    df = spark.createDataFrame(rows, "g string, k long, v long").repartition(6)
    got = {
        (r["g"], r["k"]): (r["rk"], r["n"])
        for r in grouped_index(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], "rk", "n"
        ).collect()
    }
    ws = Window.partitionBy("g")
    want = {
        (r["g"], r["k"]): (r["rk"], r["n"])
        for r in df.select(
            "g",
            "k",
            F.row_number().over(ws.orderBy("v", "k")).cast("long").alias("rk"),
            F.count("*").over(ws).cast("long").alias("n"),
        ).collect()
    }
    assert got == want


def test_grouped_topk_matches_window_topk(spark):
    """grouped_topk's two-level prune must return exactly the per-group
    window top-k (rows AND ranks), whatever the input partitioning."""
    import random

    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import grouped_topk

    rng = random.Random(3)
    rows = []
    k = 0
    for g, size in (("x", 50), ("y", 2), ("z", 31)):
        for _ in range(size):
            rows.append((g, k, rng.randrange(25)))
            k += 1
    df = spark.createDataFrame(rows, "g string, k long, v long").repartition(9)
    got = {
        (r["g"], r["k"]): r["rk"]
        for r in grouped_topk(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], 7, "rk"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    want = {
        (r["g"], r["k"]): r["rk"]
        for r in df.select(
            "g", "k", F.row_number().over(w).cast("long").alias("rk")
        ).collect()
        if r["rk"] <= 7
    }
    assert got == want


def test_grouped_rank_rejects_nan_group_keys(spark):
    """Python's sort order for NaN is arbitrary while Spark's range
    partitioner sorts NaN greatest — broadcast offsets would silently
    disagree with the layout, so NaN group keys must fail loudly
    (ADVICE r6 #1)."""
    import pytest

    from iniz_exporters_spark.operators.indexing import grouped_ntile

    df = spark.createDataFrame(
        [(1.0, 1, 5), (float("nan"), 2, 6)], "g double, k long, v long"
    )
    with pytest.raises(ValueError, match="NaN group key"):
        grouped_ntile(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], 2, "b"
        ).collect()


def test_grouped_rank_rejects_too_many_groups(spark, monkeypatch):
    """The per-group offset table is collected and broadcast — a
    high-cardinality group key must raise an actionable error instead of
    OOMing the driver (ADVICE r6 #2)."""
    import pytest

    from iniz_exporters_spark.operators import indexing

    monkeypatch.setattr(indexing, "MAX_GROUPS", 3)
    df = spark.createDataFrame(
        [(str(i), i, i) for i in range(10)], "g string, k long, v long"
    )
    with pytest.raises(ValueError, match="distinct groups"):
        indexing.grouped_ntile(
            df, ["g"], [F.col("v").asc(), F.col("k").asc()], 2, "b"
        ).collect()


# ---------------------------------------------------------------------------
# global_cumsum / avg_rank2_table (operators/indexing.py) — round-8 s2
# ---------------------------------------------------------------------------


def test_global_cumsum_matches_window(spark):
    """Range-partitioned prefix sum == the single-partition window SUM."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import global_cumsum

    df = spark.range(0, 500).select(
        ((F.col("id") * 7919) % 101).alias("k"),
        F.col("id").alias("tb"),
        ((F.col("id") % 13) + 1).alias("v"),
    )
    got = {
        (r["k"], r["tb"]): r["cum"]
        for r in global_cumsum(
            df, [F.col("k").asc(), F.col("tb").asc()], "v", "cum"
        ).collect()
    }
    w = (
        Window.orderBy("k", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["k"], r["tb"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_avg_rank2_table_matches_ansi_avg_rank(spark):
    """rank2 == 2 x AVG(ROW_NUMBER()) OVER (PARTITION BY value)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    vals = spark.range(0, 400).select(
        ((F.col("id") * 31) % 37).alias("v")
    )
    c = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    got = {
        r["v"]: r["rank2"] for r in avg_rank2_table(c, "v").collect()
    }
    rn = vals.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", F.monotonically_increasing_id()))
    )
    want = {
        r["v"]: int(2 * r["ar"])
        for r in rn.groupBy("v")
        .agg(F.avg("rn").alias("ar"))
        .collect()
    }
    assert got == want


def test_global_cumsum_empty_and_single_row(spark):
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.indexing import global_cumsum

    empty = spark.range(0).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    assert (
        global_cumsum(empty, [F.col("k").asc()], "v", "cum").count() == 0
    )
    one = spark.range(1).select(F.col("id").alias("k"), F.lit(5).alias("v"))
    rows = global_cumsum(one, [F.col("k").asc()], "v", "cum").collect()
    assert rows[0]["cum"] == 5


def test_global_prefix_matches_chained_cumsums_and_rank(spark):
    """The fused one-pass global_prefix == k chained global_cumsum
    calls plus global_index, column for column."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iniz_exporters_spark.operators.indexing import global_prefix

    df = spark.range(0, 400).select(
        ((F.col("id") * 7919) % 97).alias("k"),
        F.col("id").alias("tb"),
        ((F.col("id") % 11) + 1).alias("a"),
        ((F.col("id") % 5) * 3).alias("b"),
    )
    got = {
        (r["k"], r["tb"]): (r["ca"], r["cb"], r["t"])
        for r in global_prefix(
            df,
            [F.col("k").asc(), F.col("tb").asc()],
            {"ca": "a", "cb": "b"},
            idx_col="t",
        ).collect()
    }
    w = Window.orderBy("k", "tb")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["tb"]): (r["ca"], r["cb"], r["t"])
        for r in df.select(
            "k",
            "tb",
            F.sum("a").over(wc).alias("ca"),
            F.sum("b").over(wc).alias("cb"),
            F.row_number().over(w).cast("long").alias("t"),
        ).collect()
    }
    assert got == want


def test_global_prefix_single_pass_plan(spark):
    """global_prefix must materialize exactly ONE checkpointed layout:
    its executed plan scans a single ExistingRDD (the localCheckpoint),
    where chained global_cumsum calls would show one per call."""
    import pyspark.sql.functions as F

    from iniz_exporters_spark.operators.indexing import global_prefix

    df = spark.range(0, 100).select(
        F.col("id").alias("tb"), (F.col("id") % 7).alias("a")
    )
    out = global_prefix(df, [F.col("tb").asc()], {"ca": "a"}, idx_col="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly two ExistingRDD scans: the ONE checkpointed data layout
    # (columns start with tb) and the broadcast offsets table; chained
    # global_cumsum calls would re-checkpoint the data per call
    assert plan.count("Scan ExistingRDD[tb") == 1, plan
    assert plan.count("ExistingRDD") == 2, plan

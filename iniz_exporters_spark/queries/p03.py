"""Registry chunk 3/9: 55 @register entries (shuffle_order_topk .. calinski_harabasz_q).

Mechanical split of the original queries.py (lines 7277-10940); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.session import metadata_df
from iniz_exporters_spark.functions.text import tokens as _tokens
from iniz_exporters_spark.operators.similarity import ann_bucketed, knn_bruteforce
from iniz_exporters_spark.multimodal.binary import image_phash, phash_neardup
from iniz_exporters_spark.operators.similarity import ivf_flat_topk
from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.operators.sampling import shuffle_key
from iniz_exporters_spark.operators.curation import GOPHER_STOPWORDS, gopher_quality, oov_rate, top_k_vocab
from iniz_exporters_spark.queries.p01 import _SQL_POLY, _SQL_SHINGLE_SET, _SQL_TOKENS, _sql_minhash_sigs
from iniz_exporters_spark.queries.p02 import _BM25_ALL_TERMS, _BM25_QUERIES, _BM25_Q_VALUES, _KM_DIST, _PHASH_BANDS_CTE, _SQL_TOK_ROWS, _phash_payload, _pq_subspace_sql



@register(
    "shuffle_order_topk",
    """
    SELECT doc_id, md5('42-' || doc_id::VARCHAR) AS skey
    FROM documents ORDER BY skey, doc_id LIMIT 100
    """,
)
def shuffle_order_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("doc_id", shuffle_key("doc_id", "42").alias("skey"))
        .orderBy("skey", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# HLL sketch layer, driver-checkable: DataSketches estimates are
# implementation-defined (no DuckDB equivalent), but their ERROR BOUND and
# union-composition law are engine-stable facts — so emit those as the
# compared values. hll_ok pins |estimate − exact| ≤ 5%·exact (lgk=12 →
# rse ≈ 1.6%, 3σ ≈ 4.9%); union_ok pins that unioning per-partition
# sketches (the incremental 100 TB pattern — persist sketches per ingest
# day, answer rollups without rescanning) stays inside the same bound.
# (Union and direct estimates are NOT bit-identical — DataSketches
# sparse→dense promotion differs under union — so the bound, not equality,
# is the stable contract.)
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sketches import (  # noqa: E402
    hll_partition_sketches,
    hll_rollup,
)


# Deterministic train/val/test assignment applied to the corpus: stable
# content-keyed buckets (sorted-label ranges over poly_hash % 100) so the
# oracle replays the exact residue arithmetic. Counts per (split, lang)
# prove both the range allocation and that appending data never moves rows.
from iniz_exporters_spark.operators.sampling import hash_split  # noqa: E402
from iniz_exporters_spark.pinning import pin


@register(
    "hash_split_q",
    f"""
    WITH b AS (SELECT lang,
                      ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % 100 AS bk
               FROM documents)
    SELECT CASE WHEN bk < 10 THEN 'test'
                WHEN bk < 90 THEN 'train'
                ELSE 'val' END AS split,
           lang, COUNT(*) AS n
    FROM b GROUP BY split, lang
    """,
)
def hash_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    split = hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )


# Decontaminated train split — the standard eval-hygiene step: any train
# doc that is a NEAR-DUPLICATE (perceptual-hash pair) of a test doc is
# dropped before training. Composes three oracle-checked layers (hash
# split, phash banding, Hamming verify) plus an anti-join; only id rows
# move in the decontamination step.
@register(
    "decontaminated_split_q",
    f"""
    WITH {_PHASH_BANDS_CTE},
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.b0 AS a0, x.b1 AS a1, x.b2 AS a2, x.b3 AS a3,
               y.b0 AS c0, y.b1 AS c1, y.b2 AS c2, y.b3 AS c3
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    ),
    pp AS (SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
               + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS hd
        FROM cand) WHERE hd <= 3),
    sp AS (SELECT doc_id,
                  CASE WHEN bk < 10 THEN 'test'
                       WHEN bk < 90 THEN 'train'
                       ELSE 'val' END AS split
           FROM (SELECT doc_id,
                        ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % 100
                            AS bk
                 FROM documents)),
    test_ids AS (SELECT doc_id FROM sp WHERE split = 'test'),
    contam AS (
        SELECT p.id_a AS doc_id FROM pp p
        JOIN test_ids t ON p.id_b = t.doc_id
        UNION
        SELECT p.id_b FROM pp p JOIN test_ids t ON p.id_a = t.doc_id
    )
    SELECT split, COUNT(*) AS n_before,
           COUNT(*) FILTER (WHERE NOT (split = 'train'
                                       AND doc_id IN (SELECT doc_id
                                                      FROM contam)))
               AS n_after
    FROM sp GROUP BY split
    """,
)
def decontaminated_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sp = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    media = _phash_payload(d)
    pairs = phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")
    test_ids = sp.filter(F.col("split") == "test").select("doc_id")
    contam = (
        pairs.join(
            test_ids.withColumnRenamed("doc_id", "id_b"), "id_b"
        ).select(F.col("id_a").alias("doc_id"))
        .union(
            pairs.join(
                test_ids.withColumnRenamed("doc_id", "id_a"), "id_a"
            ).select(F.col("id_b").alias("doc_id"))
        )
        .distinct()
        .withColumn("__contam", F.lit(True))
    )
    marked = sp.join(contam, "doc_id", "left")
    return marked.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(
            F.when(
                (F.col("split") == "train") & F.col("__contam").isNotNull(),
                0,
            ).otherwise(1)
        )
        .cast("long")
        .alias("n_after"),
    )


# Count-Min Sketch layer, driver-checkable (the hll_error_check pattern):
# CMS point estimates never undercount and overcount by ≤ eps·N with the
# configured confidence — both facts are engine-stable booleans even
# though the raw estimate is implementation-defined. The sketch merge is
# counter addition (order-independent), so the checked values are
# partitioning-proof.
@register(
    "cms_error_check",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC)
                         AS rn
              FROM t GROUP BY tok) WHERE rn <= 10)
    SELECT tok, COUNT(*) AS exact_cnt, TRUE AS cms_ok
    FROM t JOIN v USING (tok)
    GROUP BY tok
    """,
)
def cms_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.sketches import cms_heavy_hitters

    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(_tokens("text")).alias("tok"))
    top = [r["tok"] for r in top_k_vocab(toks, "tok", 10).collect()]
    eps = 0.001
    sketch = cms_heavy_hitters(toks, "tok", eps=eps, seed=42)
    total = sketch.totalCount()
    est = metadata_df(spark,
        [(t, int(sketch.estimateCount(t))) for t in top],
        "tok string, est long",
    )
    exact = toks.filter(F.col("tok").isin(top)).groupBy("tok").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    return exact.join(F.broadcast(est), "tok").select(
        "tok",
        "exact_cnt",
        (
            (F.col("est") >= F.col("exact_cnt"))
            & (F.col("est") <= F.col("exact_cnt") + int(eps * total) + 1)
        ).alias("cms_ok"),
    )


@register(
    "hll_error_check",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS hll_ok,
           TRUE AS union_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def hll_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    direct = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_nd"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("l_partkey"), F.lit(12))
        ).alias("__direct_est"),
    )
    union_est = hll_rollup(
        hll_partition_sketches(
            li, "l_linestatus", "l_returnflag", "l_partkey", lgk=12
        ),
        "l_returnflag",
    ).withColumnRenamed("n_distinct_est", "__union_est")
    return direct.join(union_est, "l_returnflag").select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("__direct_est") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("hll_ok"),
        (
            F.abs(F.col("__union_est") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("union_ok"),
    )


# ---------------------------------------------------------------------------
# Round 4 — ANN recall contract. ann_bucketed / ivf_flat_topk have had
# value-checked rows since round 1, but nothing measured their RECALL vs
# the exact kNN baseline: a bucketing regression that silently drops
# neighbors would keep hashing green (the approximate result is its own
# spec). This query pins recall@5 against knn_bruteforce for the first 10
# query vectors. The hit counts are exact integers (deterministic ranking
# by (rounded cos DESC, neighbor_id) in both engines), so the oracle
# re-derives them independently in SQL — a Spark-side recall regression
# shows up as a hit-count hash mismatch AND flips the bound boolean.
# Bounds use integer arithmetic (hits*10 >= pct*total) so no float
# boundary can flip them. Measured floor across sf0.001/0.01/0.1:
# ann 19/50, ivf 40/50 → bounds 30% / 70% leave ≥4-hit margins.
# Scale shape: exact side is queries-broadcast × corpus (corpus never
# shuffles); ANN/IVF sides are the production bucketed plans; the joins
# that count hits carry (query_id, neighbor_id) pairs only.
# ---------------------------------------------------------------------------
@register(
    "ann_recall_check",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 10),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 4)
                                DESC, c.vec_id) AS rn
            FROM q JOIN e c ON c.vec_id <> q.vec_id
        ) WHERE rn <= 5
    ),
    b AS (
        SELECT vec_id, v,
               list_reduce(list_transform(range(0, 2), d ->
                   CASE WHEN v[d + 1] >= 0 THEN power(2, d)::BIGINT
                        ELSE 0::BIGINT END), (x, y) -> x + y) AS bucket
        FROM e
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY qb.vec_id
                       ORDER BY ROUND(list_cosine_similarity(qb.v, cb.v), 4)
                                DESC, cb.vec_id) AS rn
            FROM b qb JOIN b cb
              ON qb.bucket = cb.bucket AND cb.vec_id <> qb.vec_id
            WHERE qb.vec_id < 10
        ) WHERE rn <= 5
    ),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    ranked AS (
        SELECT e.vec_id, e.v, c.cidx,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                            DESC, c.cidx) AS rnk
        FROM e CROSS JOIN cents c
    ),
    member AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk = 1),
    probes AS (SELECT vec_id, v, cidx AS cell FROM ranked
               WHERE rnk <= 2 AND vec_id < 10),
    cell_topk AS (
        SELECT query_id, neighbor_id, cos FROM (
            SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(p.v, m.v), 4) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.cell
                       ORDER BY ROUND(list_cosine_similarity(p.v, m.v), 4)
                                DESC, m.vec_id) AS crn
            FROM probes p JOIN member m
              ON m.cell = p.cell AND m.vec_id <> p.vec_id
        ) t WHERE crn <= 5
    ),
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rn
            FROM cell_topk
        ) t WHERE rn <= 5
    ),
    counts AS (
        SELECT
            (SELECT COUNT(*) FROM q) AS n_queries,
            (SELECT COUNT(*) FROM exact) AS exact_total,
            (SELECT COUNT(*) FROM exact JOIN ann
                USING (query_id, neighbor_id)) AS ann_hits,
            (SELECT COUNT(*) FROM exact JOIN ivf
                USING (query_id, neighbor_id)) AS ivf_hits
    )
    SELECT n_queries, exact_total, ann_hits, ivf_hits,
           ann_hits * 10 >= 3 * exact_total AS ann_recall_ok,
           ivf_hits * 10 >= 7 * exact_total AS ivf_recall_ok
    FROM counts
    """,
)
def ann_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    q = e.filter(F.col("vec_id") < 10)
    exact = knn_bruteforce(corpus=e, queries=q, top_k=5).select(
        "query_id", "neighbor_id"
    )
    ann = (
        ann_bucketed(e, bits=2, top_k=5)
        .filter(F.col("query_id") < 10)
        .select("query_id", "neighbor_id")
    )
    ivf = (
        ivf_flat_topk(e, n_centroids=8, top_k=5, nprobe=2)
        .filter(F.col("query_id") < 10)
        .select("query_id", "neighbor_id")
    )
    totals = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("exact_total"),
    )
    ann_hits = exact.join(ann, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("ann_hits")
    )
    ivf_hits = exact.join(ivf, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("ivf_hits")
    )
    return (
        totals.crossJoin(F.broadcast(ann_hits))
        .crossJoin(F.broadcast(ivf_hits))
        .select(
            "n_queries",
            "exact_total",
            "ann_hits",
            "ivf_hits",
            (F.col("ann_hits") * 10 >= 3 * F.col("exact_total")).alias(
                "ann_recall_ok"
            ),
            (F.col("ivf_hits") * 10 >= 7 * F.col("exact_total")).alias(
                "ivf_recall_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 4 — retrieval EVALUATION metrics (NDCG@5 / MRR / P@5) over the BM25
# batch ranking. Deterministic graded relevance: a candidate's gain is the
# number of DISTINCT query terms it contains, so the whole evaluation is
# derivable from the token stream in both engines (no human qrels). The
# ideal ranking (IDCG) takes the 5 best gains over the ENTIRE corpus, not
# just the retrieved set — so NDCG genuinely measures the ranker.
# Scale shape: one token-stream pass restricted to the query vocabulary
# (terms IN (...) pushed to the scan), gains are (query, doc) aggregates,
# every per-metric frame after that is ≤ |queries|·5 rows; the DCG sums go
# through exact decimals so 5-term float addition order can never flip a
# hash. MRR uses MAX(1/rank) (order-independent).
# ---------------------------------------------------------------------------
@register(
    "retrieval_eval_q",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
    nq AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY query_id),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ({_BM25_ALL_TERMS}) GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(CAST(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                   AS DECIMAL(28,12))), 6)::DOUBLE AS bm25
        FROM tf JOIN qt USING (tok) JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN a CROSS JOIN n
        GROUP BY qt.query_id, tf.doc_id
    ),
    topk AS (SELECT query_id, doc_id, rn FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM scored) WHERE rn <= 5),
    gains AS (
        SELECT qt.query_id, t2.doc_id,
               COUNT(DISTINCT t2.tok) AS gain
        FROM (SELECT DISTINCT doc_id, tok FROM tf) t2
        JOIN qt ON t2.tok = qt.tok
        GROUP BY qt.query_id, t2.doc_id
    ),
    ideal AS (
        SELECT query_id,
               SUM(CAST(gain / log2(irn + 1.0) AS DECIMAL(28,12))) AS idcg
        FROM (SELECT query_id, gain,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY gain DESC, doc_id ASC)
                         AS irn
              FROM gains) WHERE irn <= 5
        GROUP BY query_id
    ),
    got AS (
        SELECT tk.query_id,
               SUM(CAST(g.gain / log2(tk.rn + 1.0) AS DECIMAL(28,12)))
                   AS dcg,
               MAX(CASE WHEN g.gain = nq.n_terms
                        THEN ROUND(1.0 / tk.rn, 6) ELSE 0.0 END) AS mrr,
               ROUND(SUM(CASE WHEN g.gain = nq.n_terms THEN 1 ELSE 0 END)
                     / 5.0, 6) AS p_at_5
        FROM topk tk
        JOIN gains g USING (query_id, doc_id)
        JOIN nq USING (query_id)
        GROUP BY tk.query_id
    )
    SELECT got.query_id,
           ROUND(CAST(got.dcg / ideal.idcg AS DOUBLE), 6) AS ndcg_at_5,
           mrr, p_at_5
    FROM got JOIN ideal USING (query_id)
    """,
)
def retrieval_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    topk = bm25_multi_topk(d, _BM25_QUERIES, "doc_id", "text", top_k=5)

    qterms = metadata_df(spark,
        [(qid, t) for qid, ts in _BM25_QUERIES for t in ts],
        "query_id string, tok string",
    )
    all_terms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    nq = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))

    # graded gain = distinct query terms present in the doc; the token
    # scan is pruned to the query vocabulary before the shuffle
    doc_terms = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .filter(F.col("tok").isin(all_terms))
        .distinct()
    )
    gains = (
        doc_terms.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("tok").alias("gain"))
    )

    dec = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col("doc_id").asc()
    )
    ideal = (
        gains.withColumn("irn", F.row_number().over(w_ideal))
        .filter(F.col("irn") <= 5)
        .groupBy("query_id")
        .agg(F.sum(dec(F.col("gain") / F.log2(F.col("irn") + 1.0))).alias("idcg"))
    )
    got = (
        topk.join(gains, ["query_id", "doc_id"])
        .join(F.broadcast(nq), "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(dec(F.col("gain") / F.log2(F.col("rn") + 1.0))).alias("dcg"),
            F.max(
                F.when(
                    F.col("gain") == F.col("n_terms"),
                    F.round(1.0 / F.col("rn"), 6),
                ).otherwise(0.0)
            ).alias("mrr"),
            F.round(
                F.sum(
                    F.when(F.col("gain") == F.col("n_terms"), 1).otherwise(0)
                )
                / 5.0,
                6,
            ).alias("p_at_5"),
        )
    )
    return got.join(F.broadcast(ideal), "query_id").select(
        "query_id",
        F.round((F.col("dcg") / F.col("idcg")).cast("double"), 6).alias(
            "ndcg_at_5"
        ),
        "mrr",
        "p_at_5",
    )


# ---------------------------------------------------------------------------
# Round 4 — training-mix temperature rebalancing (the multilingual-corpus
# lever: raw language shares p_l are flattened to w_l ∝ p_l^alpha, alpha
# 0.5, so low-resource languages are upsampled without letting any one
# dominate — the standard temperature-sampling scheme in multilingual LM
# training). Emits, per language: raw share, rebalanced weight, expected
# docs under the reweighted mix, and the implied epoch multiplier (how
# many passes over that language's data one reweighted epoch costs).
# Scale shape: one count aggregate (map-side partials) to language-count
# rows; everything after is arithmetic on that metadata frame — the
# 1-row total and the 1-row weight normalizer join back via broadcast.
# ---------------------------------------------------------------------------
@register(
    "mix_temperature_q",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM c),
    w AS (SELECT lang, n_docs, n_docs / total AS p,
                 pow(n_docs / total, 0.5) AS pw
          FROM c CROSS JOIN tot),
    z AS (SELECT SUM(CAST(pw AS DECIMAL(28,12))) AS zsum FROM w)
    SELECT lang, n_docs,
           ROUND(p, 6) AS p,
           ROUND(CAST(pw / zsum AS DOUBLE), 6) AS weight,
           ROUND(CAST(pw / zsum AS DOUBLE) * total, 2) AS expected_docs,
           ROUND(CAST(pw / zsum AS DOUBLE) * total / n_docs, 4) AS epochs
    FROM w CROSS JOIN z CROSS JOIN tot
    """,
)
def mix_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = c.agg(F.sum("n_docs").cast("double").alias("total"))
    w = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.col("total")).alias("p"),
        F.pow(F.col("n_docs") / F.col("total"), 0.5).alias("pw"),
        "total",
    )
    z = w.agg(F.sum(F.col("pw").cast("decimal(28,12)")).alias("zsum"))
    weight = (F.col("pw") / F.col("zsum")).cast("double")
    return w.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round(weight, 6).alias("weight"),
        F.round(weight * F.col("total"), 2).alias("expected_docs"),
        F.round(weight * F.col("total") / F.col("n_docs"), 4).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Round 4 — embedding centroid drift between corpus halves (vec_id median
# split = ingest-order proxy, the same convention as corpus_diff_q /
# token_psi_q): per-half per-dimension means via exact DECIMAL sums
# (order-independent → hash-stable at any partitioning), then centroid
# cosine and L2 distance computed on the d-row dimension frame. The drift
# statistic a retrieval/embedding pipeline alerts on when the upstream
# encoder or corpus shifts. Scale shape: one posexplode pass (rows = n·d,
# but only (half, dim, value) triples — no vectors shuffle whole), one
# groupBy(half, dim) with map-side partials down to 2·d rows, then all
# metric arithmetic happens on that metadata frame.
# ---------------------------------------------------------------------------
@register(
    "centroid_drift_q",
    """
    WITH med AS (
        -- FLOOR, not a bare BIGINT cast: DuckDB's double→BIGINT cast
        -- rounds while Spark's truncates, and a .5 midpoint would shift
        -- one vector across the half boundary
        SELECT CAST(FLOOR(SUM(vec_id)::DOUBLE / COUNT(*)) AS BIGINT) AS mid
        FROM embeddings
    ),
    ex AS (
        SELECT CASE WHEN vec_id < mid THEN 0 ELSE 1 END AS half,
               i AS dim, embedding[i + 1]::DOUBLE AS v
        FROM embeddings CROSS JOIN med
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) d
    ),
    m AS (
        SELECT half, dim,
               CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS mu
        FROM ex GROUP BY half, dim
    ),
    p AS (
        SELECT a.dim, a.mu AS mu0, b.mu AS mu1
        FROM (SELECT dim, mu FROM m WHERE half = 0) a
        JOIN (SELECT dim, mu FROM m WHERE half = 1) b USING (dim)
    ),
    agg AS (
        SELECT COUNT(*) AS n_dims,
               CAST(SUM(CAST(mu0 * mu1 AS DECIMAL(38,18))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(mu0 * mu0 AS DECIMAL(38,18))) AS DOUBLE) AS n0,
               CAST(SUM(CAST(mu1 * mu1 AS DECIMAL(38,18))) AS DOUBLE) AS n1,
               CAST(SUM(CAST((mu0 - mu1) * (mu0 - mu1) AS DECIMAL(38,18)))
                    AS DOUBLE) AS sq
        FROM p
    )
    SELECT CAST(n_dims AS BIGINT) AS n_dims,
           ROUND(dot / (sqrt(n0) * sqrt(n1)), 6) AS centroid_cos,
           ROUND(sqrt(sq), 6) AS centroid_l2
    FROM agg
    """,
)
def centroid_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    mid = e.agg(
        F.floor(
            F.sum("vec_id").cast("double") / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("mid")
    )
    ex = (
        e.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("vec_id") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .select("half", "dim", F.col("v").cast("double").alias("v"))
    )
    m = ex.groupBy("half", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    p = (
        m.filter(F.col("half") == 0)
        .select("dim", F.col("mu").alias("mu0"))
        .join(
            m.filter(F.col("half") == 1).select(
                "dim", F.col("mu").alias("mu1")
            ),
            "dim",
        )
    )
    dec38 = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    agg = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum(dec38(F.col("mu0") * F.col("mu1"))).cast("double").alias("dot"),
        F.sum(dec38(F.col("mu0") * F.col("mu0"))).cast("double").alias("n0"),
        F.sum(dec38(F.col("mu1") * F.col("mu1"))).cast("double").alias("n1"),
        F.sum(dec38((F.col("mu0") - F.col("mu1")) * (F.col("mu0") - F.col("mu1"))))
        .cast("double")
        .alias("sq"),
    )
    return agg.select(
        "n_dims",
        F.round(
            F.col("dot") / (F.sqrt(F.col("n0")) * F.sqrt(F.col("n1"))), 6
        ).alias("centroid_cos"),
        F.round(F.sqrt(F.col("sq")), 6).alias("centroid_l2"),
    )


# ---------------------------------------------------------------------------
# Round 4 (continued) — data-dependent dimensionality reduction. PCA
# complements the data-oblivious jl_project: one metadata-scale covariance
# aggregation buys the variance-optimal subspace (IVF coarse quantizers,
# drift monitoring). Covariance is fully value-checked; the eigen layer is
# pinned by sign-invariant contracts (projection variance == eigenvalue)
# because no SQL engine replays eigh.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.pca import (  # noqa: E402
    PcaModel,
    covariance_pairs,
    pca_fit,
    projection_variances,
)

_COV_SQL_EX = """
    ex AS (
        SELECT vec_id, i AS dim, embedding[i + 1]::DOUBLE AS v
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS i) d
    ),
    mm AS (
        SELECT dim, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS mu
        FROM ex GROUP BY dim
    ),
    cv AS (
        SELECT a.dim AS i, b.dim AS j,
               ROUND(CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*) - mi.mu * mj.mu, 6) AS cov
        FROM ex a
        JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        JOIN mm mi ON mi.dim = a.dim
        JOIN mm mj ON mj.dim = b.dim
        GROUP BY a.dim, b.dim, mi.mu, mj.mu
    )
"""


@register(
    "embedding_covariance_q",
    f"""
    WITH {_COV_SQL_EX}
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, cov FROM cv
    """,
    headline=True,
)
def embedding_covariance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle population covariance of the first 8 embedding dims.
    One corpus scan; the per-row triangle explode pipelines into a map-side
    partial aggregate, so only (partitions x 36) decimal partials shuffle —
    the distributed-covariance shape that holds at any corpus size."""
    e = Catalog(spark, sf_dir).embeddings
    return covariance_pairs(e, "embedding", dims=8)


@register(
    "pca_project_check",
    f"""
    WITH {_COV_SQL_EX},
    tr AS (SELECT ROUND(SUM(cov), 6) AS trace_r FROM cv WHERE i = j)
    SELECT CAST(k AS INTEGER) AS comp, tr.trace_r,
           TRUE AS ordered_ok, TRUE AS var_ok, TRUE AS eigsum_ok
    FROM (SELECT unnest(range(0, 4)) AS k) CROSS JOIN tr
    """,
)
def pca_project_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA eigen-layer contract, sign-invariant so it is engine-checkable:
    (a) eigenvalues descend, (b) the population variance of each projected
    component equals its eigenvalue (the defining property of PCA — a wrong
    mean, covariance, eigvec, or projection all break it), (c) the eigvals
    sum to the covariance trace. The oracle re-derives the exact trace from
    decimal sums and pins the booleans TRUE. Eigh runs driver-side on the
    8x8 metadata matrix; the variance check is one distributed scan."""
    e = Catalog(spark, sf_dir).embeddings
    full = pca_fit(e, "embedding", dims=8, top_k=8)
    model = PcaModel(
        dims=8,
        mean=full.mean,
        eigvals=full.eigvals[:4],
        components=full.components[:4],
        trace=full.trace,
    )
    pvars = projection_variances(e, "embedding", model)
    tol = 1e-3 * max(1.0, abs(full.eigvals[0]))
    trace_r = round(full.trace, 6)
    eigsum_ok = abs(sum(full.eigvals) - full.trace) <= tol
    rows = []
    for k in range(4):
        rows.append(
            (
                k,
                trace_r,
                full.eigvals[k] <= full.eigvals[k - 1] + 1e-9 if k else True,
                abs(pvars[k] - full.eigvals[k]) <= tol,
                eigsum_ok,
            )
        )
    return metadata_df(spark,
        rows,
        "comp int, trace_r double, ordered_ok boolean, var_ok boolean,"
        " eigsum_ok boolean",
    )


# ---------------------------------------------------------------------------
# Incremental (batch-vs-corpus) near-dup: the continual-training shape —
# each crawl increment is deduped against the standing corpus with the
# batch side broadcast, so the corpus is scanned once and never shuffled.
# Same band geometry as neardup_pairs, so the oracle replays candidate
# generation exactly and the flagged links hash-match.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.dedup import incremental_neardup  # noqa: E402


@register(
    "incremental_neardup_q",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS batch_id, o.doc_id AS corpus_id
        FROM bands o JOIN bands n
          ON o.band = n.band AND o.bucket = n.bucket
        WHERE n.doc_id % 20 = 7 AND o.doc_id % 20 <> 7
    ),
    scored AS (
        SELECT batch_id, corpus_id,
               ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                     / (len(ha.hs) + len(hb.hs)
                        - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
        FROM cand
        JOIN sh ha ON ha.doc_id = batch_id
        JOIN sh hb ON hb.doc_id = corpus_id
    )
    SELECT batch_id, corpus_id, jaccard FROM scored WHERE jaccard >= 0.6
    """,
    headline=True,
)
def incremental_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import (
        incremental_neardup_sets,
        shingle_band_sets,
    )

    d = Catalog(spark, sf_dir).documents
    # Corpus and batch are slices of ONE table here, so the fused
    # shingle+band kernel runs ONCE over it (pinned) and the slices are
    # filters — one Python-boundary crossing instead of four (r15; the
    # self-contained two-table contract stays in incremental_neardup).
    base = shingle_band_sets(
        d, "doc_id", "text", k=5, num_perm=16, rows_per_band=4
    ).transform(pin)
    return incremental_neardup_sets(
        base.filter(F.col("doc_id") % 20 != 7),
        base.filter(F.col("doc_id") % 20 == 7),
        "doc_id",
        threshold=0.6,
    )


# ---------------------------------------------------------------------------
# Length-bucketed training batches: padding-efficiency layout (docs bucketed
# by granularity-rounded length, longest-first batches of 8, per-batch pad
# waste). One shuffle keyed on the bucket.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.lm import length_bucketed_batches  # noqa: E402


@register(
    "length_batches_q",
    f"""
    WITH t AS (
        SELECT doc_id, len({_SQL_TOKENS}) AS n_tok FROM documents
    ),
    b AS (
        SELECT doc_id, n_tok,
               CAST(CEIL(n_tok::DOUBLE / 64) AS BIGINT) AS bucket
        FROM t
    ),
    o AS (
        SELECT bucket, n_tok,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket ORDER BY n_tok DESC, doc_id ASC
               ) AS rn
        FROM b
    )
    SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           CAST(sum(n_tok) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
    FROM o GROUP BY bucket, (rn - 1) // 8
    """,
)
def length_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "doc_id", F.size(_tokens("text")).cast("long").alias("n_tok")
    )
    return length_bucketed_batches(
        t, "doc_id", "n_tok", batch_size=8, granularity=64
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023): unigram log-likelihood ratio of
# target domain vs raw pool, add-1 smoothed — the principled "make the pool
# look like the target" selection signal. Both unigram tables broadcast; the
# pool shuffles once on doc_id.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.curation import dsir_weights  # noqa: E402


@register(
    "dsir_weights_q",
    f"""
    WITH pt AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents WHERE source NOT IN ('src0', 'src1', 'src2')
    ),
    tt AS (
        SELECT unnest({_SQL_TOKENS}) AS tok
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ),
    pf AS (SELECT tok, count(*) AS c_pool FROM pt GROUP BY tok),
    tf AS (SELECT tok, count(*) AS c_tgt FROM tt GROUP BY tok),
    v AS (
        SELECT tok, COALESCE(c_pool, 0) AS c_pool, COALESCE(c_tgt, 0) AS c_tgt
        FROM pf FULL OUTER JOIN tf USING (tok)
    ),
    tot AS (
        SELECT sum(c_pool)::DOUBLE AS n_pool, sum(c_tgt)::DOUBLE AS n_tgt,
               count(*)::DOUBLE AS vv
        FROM v
    ),
    r AS (
        SELECT tok, ln((c_tgt + 1) / (n_tgt + vv))
                    - ln((c_pool + 1) / (n_pool + vv)) AS logratio
        FROM v CROSS JOIN tot
    )
    SELECT doc_id,
           ROUND(CAST(avg(logratio) AS DECIMAL(28,12)), 6)::DOUBLE
               AS avg_logratio,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM pt JOIN r USING (tok) GROUP BY doc_id
    """,
    headline=True,
)
def dsir_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tgt_src = F.col("source").isin("src0", "src1", "src2")
    return dsir_weights(
        d.filter(~tgt_src), d.filter(tgt_src), "doc_id", _tokens
    )


# ---------------------------------------------------------------------------
# Asymmetric containment dedup: |A∩B| / |A| over distinct 5-char shingle
# sets — the quote/inclusion detector symmetric Jaccard misses (a paragraph
# quoted inside a 10× longer page scores J≈0.1 but containment≈1.0). The
# probe side broadcasts; the host corpus is scanned once and never shuffled
# on the shingle hash; the intersection size IS the matched-pair count.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.dedup import containment_pairs  # noqa: E402


@register(
    "containment_pairs_q",
    f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLE_SET} AS hs FROM documents),
    pr AS (
        SELECT doc_id AS probe_id, len(hs) AS sz, unnest(hs) AS h
        FROM sh WHERE doc_id % 25 = 11
    ),
    tr AS (
        SELECT doc_id AS host_id, unnest(hs) AS h
        FROM sh WHERE doc_id % 25 <> 11
    ),
    j AS (
        SELECT probe_id, host_id,
               CAST(count(*) AS BIGINT) AS n_shared, min(sz) AS sz
        FROM tr JOIN pr USING (h)
        GROUP BY probe_id, host_id
    )
    SELECT probe_id, host_id,
           ROUND(n_shared::DOUBLE / sz, 4) AS containment
    FROM j WHERE n_shared * 5 >= 4 * sz
    """,
    headline=True,
)
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import (
        containment_pairs_sets,
        shingle_sets,
    )

    d = Catalog(spark, sf_dir).documents
    pb = F.col("doc_id") % 25 == 11
    # both sides come from the same table: run the Arrow shingle kernel
    # ONCE, pin the sets, and split — halves the dominant cost
    sets = shingle_sets(d, "doc_id", "text", k=5).transform(pin, eager=True)
    return containment_pairs_sets(
        sets.filter(~pb), sets.filter(pb), "doc_id", threshold=0.8
    )


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search (the FAISS-IVFPQ scoring core): per-query
# m×k lookup tables of exact subvector→centroid distances, corpus scored
# via code lookups only — the full-precision corpus is never read at query
# time. The oracle replays the whole stack: every subspace's Lloyd rounds
# (same CTE chain as pq_codes), the LUT arithmetic (identical left-fold
# order), and the (rounded adc asc, id asc) ranking.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import (  # noqa: E402
    pq_adc_topk,
    pq_model,
)


def _pq_lut_sql(j: int, subdim: int = 16) -> str:
    a = j * subdim  # 0-based offset; qv is 1-based in DuckDB
    return f"""
    lut{j} AS (
        SELECT q.query_id, c.cid,
               list_reduce(list_transform(range(1, {subdim + 1}),
                   i -> (q.qv[{a} + i] - c.v[i]) * (q.qv[{a} + i] - c.v[i])),
                   (x, y) -> x + y) AS d
        FROM q CROSS JOIN c1{j} c
    )"""


@register(
    "pq_adc_topk",
    "WITH "
    + ",".join(_pq_subspace_sql(j) for j in range(4))
    + ",\n    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv"
    + " FROM embeddings WHERE vec_id < 3),"
    + ",".join(_pq_lut_sql(j) for j in range(4))
    + """,
    codes AS (
        SELECT a10.vec_id, a10.cid AS k0, a11.cid AS k1,
               a12.cid AS k2, a13.cid AS k3
        FROM a10 JOIN a11 USING (vec_id) JOIN a12 USING (vec_id)
        JOIN a13 USING (vec_id)
    ),
    adc AS (
        SELECT q.query_id, codes.vec_id,
               ROUND(l0.d + l1.d + l2.d + l3.d, 6) AS adc_dist
        FROM codes CROSS JOIN q
        JOIN lut0 l0 ON l0.query_id = q.query_id AND l0.cid = codes.k0
        JOIN lut1 l1 ON l1.query_id = q.query_id AND l1.cid = codes.k1
        JOIN lut2 l2 ON l2.query_id = q.query_id AND l2.cid = codes.k2
        JOIN lut3 l3 ON l3.query_id = q.query_id AND l3.cid = codes.k3
        WHERE codes.vec_id <> q.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
        ) AS rn
        FROM adc
    ) WHERE rn <= 5
    """,
    headline=True,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    codes, books = pq_model(e, "vec_id", "embedding", m=4, subdim=16, k=4, iters=2)
    qs = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    out = pq_adc_topk(codes, books, qs, "vec_id", subdim=16, top_k=5)
    return out.withColumn("rn", F.col("rn").cast("long"))


# ---------------------------------------------------------------------------
# Round-4 batch C: entity resolution, CCNet perplexity buckets, the hashing
# trick, degree-oriented triangle counting, truncated EWMA, Pareto
# frontier, bloom-pruned semi-join.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.linkage import record_linkage_pairs
from iniz_exporters_spark.operators.lm import interpolated_perplexity
from iniz_exporters_spark.operators.timeseries import ewma
from iniz_exporters_spark.operators.indexing import bloom_candidates
from iniz_exporters_spark.plans.graph import triangle_stats
from iniz_exporters_spark.functions.text import feature_hash_vector
from iniz_exporters_spark.functions.text import tokens as _hf_tokens


# Entity resolution: blocked candidate generation (block = noun token +
# adjective initial) + Levenshtein verify. The self-join shuffles on the
# blocking key only; a broadcast size-filter drops over-populated blocks
# (the under-discriminating-key failure mode) before any pair forms.
@register(
    "record_linkage_q",
    """
    WITH blocked AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[2] || '|' || substr(p_name, 1, 1)
                   AS bk
        FROM part
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           ROUND(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
                     / greatest(length(a.p_name), length(b.p_name)),
                 4) AS sim
    FROM blocked a JOIN blocked b
      ON a.bk = b.bk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
      AND 1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
              / greatest(length(a.p_name), length(b.p_name)) >= 0.5
    """,
)
def record_linkage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    bk = F.concat(
        F.element_at(F.split("p_name", " "), 2),
        F.lit("|"),
        F.substring("p_name", 1, 1),
    )
    return record_linkage_pairs(
        p, "p_partkey", "p_name", bk, max_lev=4, min_sim=0.5
    )


# CCNet-style perplexity filter (Wenzek et al. 2020): score every doc with
# an interpolated bigram/unigram LM fit on the corpus, then split each
# language into head/middle/tail perplexity terciles.
@register(
    "lm_perplexity_q",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
    uni AS (SELECT unnest(t) AS w FROM toks),
    cu AS (SELECT w, COUNT(*) AS cu FROM uni GROUP BY w),
    tot AS (SELECT COUNT(*) AS N, COUNT(DISTINCT w) AS V FROM uni),
    scored AS (
        SELECT p.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(ROUND(CAST(SUM(CAST(
                   log2(0.7 * ((c12.c12 + 1)::DOUBLE
                               / (c1.c1 + tot.V)::DOUBLE)
                        + 0.3 * ((cu.cu + 1)::DOUBLE
                                 / (tot.N + tot.V)::DOUBLE))
                   AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
                   AS lp
        FROM pairs p
        JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
        JOIN c1 ON p.w1 = c1.w1
        JOIN cu ON p.w2 = cu.w
        CROSS JOIN tot
        GROUP BY p.doc_id
    ),
    ppl AS (
        SELECT s.doc_id, d.lang, s.n_bigrams,
               ROUND(pow(2.0, -s.lp / s.n_bigrams), 2) AS ppl
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, lang, n_bigrams, ppl,
           CAST(NTILE(3) OVER (PARTITION BY lang
                               ORDER BY ppl ASC, doc_id ASC) AS BIGINT)
               AS bucket
    FROM ppl
    """,
)
def lm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return interpolated_perplexity(d, "doc_id", "text", lam=0.7, n_buckets=3)


# Hashing trick (Weinberger et al. 2009): fixed-width bag-of-words vector
# per doc, built entirely per-row in codegen — no vocabulary pass, no
# dictionary state, zero shuffles at any corpus size. The vector is
# serialized with array_join(';') for the gate (the driver's pandas
# canonicalizer cannot hash list cells — see tests/test_registry_lint.py);
# feature_hash_vector itself still yields the typed array for pipelines.
@register(
    "feature_hash_q",
    f"""
    WITH h AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS},
                   t -> {_SQL_POLY.format(s="t")} % 64) AS th
        FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(
               list_transform(range(0, 64),
                   b -> len(list_filter(th, x -> x = b))), ';'), '') AS vec,
           len(list_filter(
               list_transform(range(0, 64),
                   b -> len(list_filter(th, x -> x = b))),
               c -> c > 0)) AS nnz,
           CAST(len(th) AS BIGINT) AS n_tokens
    FROM h
    """,
)
def feature_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    vec = feature_hash_vector("text", dim=64)
    return d.select(
        "doc_id",
        F.array_join(vec, ";").alias("vec"),
        F.size(F.filter(vec, lambda c: c > 0)).alias("nnz"),
        F.size(_hf_tokens("text")).cast("long").alias("n_tokens"),
    )


# Degree-oriented triangle counting (Suri & Vassilvitskii 2011) over the
# co-purchase graph (parts sharing an order). Orientation by (degree, id)
# bounds every out-degree by O(sqrt(E)), so the wedge join is skew-proof:
# a celebrity part contributes wedges only through low-degree neighbors.
@register(
    "triangle_count_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    ed AS (
        SELECT e.a, e.b, da.d AS da, db.d AS db
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    oriented AS (
        SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
               CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dd
        FROM ed
    ),
    wedges AS (
        SELECT o1.dst AS v, o2.dst AS w
        FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
        WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM wedges WHERE EXISTS (
            SELECT 1 FROM oriented c
            WHERE c.src = wedges.v AND c.dst = wedges.w)
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg)
               AS n_wedges,
           tri.n_triangles,
           ROUND(CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) > 0
                      THEN 3.0 * tri.n_triangles
                           / (SELECT SUM(d * (d - 1) / 2) FROM deg)
                      ELSE 0.0 END, 4) AS clustering
    FROM tri
    """,
)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return triangle_stats(edges)


# Truncated-recursion EWMA as a window fold: the classic "not expressible
# as a window aggregate" smoother, made one by bounding the horizon (8
# observations ≈ weight floor 0.7^8 < 6%) and left-folding the recursion
# over the frame's collected values — identical fold order both engines.
@register(
    "ewma_q",
    """
    WITH framed AS (
        SELECT user_id, ts, event_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS frame
        FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(value AS DOUBLE) AS value,
           list_reduce(list_prepend(0.0, frame),
                       (acc, x) -> acc * 0.7 + x * 0.3) AS ewma
    FROM framed
    """,
)
def ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    # raw fold, no explicit round: bit-identical across engines; the
    # gate's 9-dp float normalization absorbs repr ties (see operators/
    # timeseries.ewma docstring)
    return ewma(
        e, "user_id", "ts", "value", "event_id", alpha=0.3, depth=8
    ).select("user_id", "ts", "event_id", "value", "ewma")


# 2-D Pareto frontier (skyline) of daily best order price: a day is on
# the frontier iff its max price strictly beats every earlier day's. One
# per-day agg + one running-max window — the O(n log n) sort-based
# skyline, not the quadratic dominance anti-join.
@register(
    "pareto_frontier_q",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               max(o_totalprice) AS day_max
        FROM orders GROUP BY day
    ),
    runn AS (
        SELECT day, day_max,
               max(day_max) OVER (
                   ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM daily
    )
    SELECT day, ROUND(day_max, 2) AS day_max
    FROM runn WHERE prev_max IS NULL OR day_max > prev_max
    """,
)
def pareto_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.max("o_totalprice").alias("day_max"))
    )
    # global (unpartitioned) window — deliberate: it runs over the
    # per-DAY aggregate, which is calendar-bounded metadata (~36.5k rows
    # per century) regardless of corpus size; the fact-scale work happened
    # in the groupBy above
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    runn = daily.withColumn("prev_max", F.max("day_max").over(w))
    return runn.filter(
        F.col("prev_max").isNull() | (F.col("day_max") > F.col("prev_max"))
    ).select("day", F.round("day_max", 2).alias("day_max"))


# Bloom-pruned semi-join: the dim side's (tiny) position set prunes the
# fact scan before any shuffle — Spark's runtime row-level filtering,
# expressed portably so the oracle replays the identical candidate set.
# n_candidates (bloom survivors incl. false positives) is itself a
# checked value: a hashing regression would flip it.
@register(
    "bloom_prune_join_q",
    f"""
    WITH dimk AS (
        SELECT s_suppkey, s_suppkey::VARCHAR AS ks
        FROM supplier WHERE s_nationkey = 3
    ),
    pos AS (
        SELECT DISTINCT p FROM (
            SELECT {_SQL_POLY.format(s="ks")} % 4096 AS p FROM dimk
            UNION ALL
            SELECT (({_SQL_POLY.format(s="ks")} * 1000003 + 12345)
                    % 1000000007) % 4096 AS p FROM dimk)
    ),
    parr AS (SELECT list(p ORDER BY p) AS ps FROM pos),
    fact AS (
        SELECT l_suppkey, l_extendedprice,
               {_SQL_POLY.format(s="l_suppkey::VARCHAR")} AS h
        FROM lineitem
    ),
    cand AS (
        SELECT f.l_suppkey, f.l_extendedprice
        FROM fact f CROSS JOIN parr
        WHERE list_contains(ps, h % 4096)
          AND list_contains(ps, ((h * 1000003 + 12345) % 1000000007) % 4096)
    ),
    matched AS (
        SELECT c.* FROM cand c
        WHERE EXISTS (SELECT 1 FROM dimk d WHERE d.s_suppkey = c.l_suppkey)
    )
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM matched) AS n_matched,
           CAST(ROUND((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                       FROM matched), 2) AS DOUBLE) AS revenue
    """,
)
def bloom_prune_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    dim = cat.supplier.filter(F.col("s_nationkey") == 3).select("s_suppkey")
    cand = bloom_candidates(
        cat.lineitem.select("l_suppkey", "l_extendedprice"),
        "l_suppkey",
        dim,
        "s_suppkey",
        m=4096,
    )
    matched = cand.join(
        F.broadcast(dim),
        cand["l_suppkey"] == dim["s_suppkey"],
        "left_semi",
    )
    return (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(
            matched.agg(
                F.count(F.lit(1)).alias("n_matched"),
                F.round(F.sum(_dec(F.col("l_extendedprice"))), 2)
                .cast("double")
                .alias("revenue"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Round-4 batch D: grid-density outliers (DBSCAN core step), Benford
# digit audit, largest-remainder stratified sampling, rolling lag-1
# autocorrelation.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.clustering import grid_density
from iniz_exporters_spark.operators.sampling import (
    stratified_allocation,
    stratified_take,
)
from iniz_exporters_spark.operators.timeseries import rolling_autocorr


# Grid-bucketed density: the scalable DBSCAN core-point step — no
# point-to-point distances, the O(n²) neighborhood problem becomes
# O(occupied_cells · 9).
@register(
    "grid_density_q",
    """
    WITH pts AS (
        SELECT vec_id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cx,
               CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, COUNT(*) AS c FROM pts GROUP BY cx, cy),
    nbr AS (
        SELECT cells.cx + dx.d AS cx, cells.cy + dy.d AS cy,
               SUM(c) AS nbr_count
        FROM cells
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
        GROUP BY 1, 2
    )
    SELECT p.vec_id, p.cx, p.cy,
           CAST(n.nbr_count AS BIGINT) AS nbr_count,
           n.nbr_count >= 8 AS is_core
    FROM pts p JOIN nbr n USING (cx, cy)
    """,
)
def grid_density_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return grid_density(
        e,
        "vec_id",
        F.col("embedding").getItem(0).cast("double"),
        F.col("embedding").getItem(1).cast("double"),
        h=0.1,
        min_pts=8,
    )


# Benford first-digit audit: a data-quality screen for fabricated or
# truncated numeric columns — natural multiplicative data follows
# log10(1 + 1/d); a uniform or spiked digit histogram is the red flag.
@register(
    "benford_audit_q",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, n,
           n::DOUBLE / total AS frac,
           log10(1 + 1.0 / digit) AS benford
    FROM c CROSS JOIN t
    """,
)
def benford_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    digit = (
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    # raw doubles (frac, benford): identical expressions both engines;
    # the gate's 9-dp normalization absorbs libm log10 last-bit skew
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("frac"),
        F.log10(1 + 1.0 / F.col("digit")).alias("benford"),
    )


# Largest-remainder (Hamilton) stratified allocation + the content-keyed
# sample it admits — pure integer arithmetic end to end, so the split is
# bit-stable across engines, partitionings, and reruns.
@register(
    "stratified_alloc_q",
    f"""
    WITH c AS (SELECT c_mktsegment AS stratum, COUNT(*) AS n_stratum
               FROM customer GROUP BY 1),
    t AS (SELECT SUM(n_stratum) AS N FROM c),
    b AS (SELECT stratum, n_stratum,
                 (300 * n_stratum) // N AS base,
                 (300 * n_stratum) % N AS rem
          FROM c CROSS JOIN t),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum ASC)
                        AS rk,
                 300 - SUM(base) OVER () AS extras
          FROM b),
    a AS (SELECT stratum, n_stratum,
                 base + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS n_alloc
          FROM r),
    ranked AS (
        SELECT c_mktsegment AS stratum, c_custkey,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY {_SQL_POLY.format(s="c_custkey::VARCHAR")} ASC,
                            c_custkey ASC) AS rn
        FROM customer
    ),
    tk AS (SELECT ranked.stratum, COUNT(*) AS n_taken,
                  SUM(c_custkey) AS key_sum
           FROM ranked JOIN a USING (stratum)
           WHERE rn <= n_alloc GROUP BY 1)
    SELECT a.stratum, a.n_stratum, CAST(a.n_alloc AS BIGINT) AS n_alloc,
           COALESCE(tk.n_taken, 0) AS n_taken,
           CAST(COALESCE(tk.key_sum, 0) AS BIGINT) AS key_sum
    FROM a LEFT JOIN tk USING (stratum)
    """,
)
def stratified_alloc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer
    alloc = stratified_allocation(cust, "c_mktsegment", "c_custkey", 300)
    taken = (
        stratified_take(cust, "c_mktsegment", "c_custkey", 300)
        .groupBy(F.col("c_mktsegment").alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )
    return (
        alloc.join(taken, "stratum", "left")
        .select(
            "stratum",
            "n_stratum",
            "n_alloc",
            F.coalesce("n_taken", F.lit(0)).alias("n_taken"),
            F.coalesce("key_sum", F.lit(0)).alias("key_sum"),
        )
    )


# Trailing lag-1 autocorrelation per key: exact decimal windowed sums,
# closed-form Pearson in double, emitted raw (see operators/timeseries).
@register(
    "rolling_autocorr_q",
    """
    WITH lagged AS (
        SELECT user_id, ts, event_id,
               CAST(value AS DECIMAL(18,4)) AS x,
               LAG(CAST(value AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS y
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN 1 END) OVER fr
                    AS DOUBLE) AS n,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x END) OVER fr
                    AS DOUBLE) AS sx,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN y END) OVER fr
                    AS DOUBLE) AS sy,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x * x END) OVER fr
                    AS DOUBLE) AS sxx,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN y * y END) OVER fr
                    AS DOUBLE) AS syy,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x * y END) OVER fr
                    AS DOUBLE) AS sxy
        FROM lagged
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id,
           CASE WHEN n >= 3
                 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
           END AS corr
    FROM s
    """,
)
def rolling_autocorr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return rolling_autocorr(
        e, "user_id", "ts", "value", "event_id", window_rows=16
    )


# ---------------------------------------------------------------------------
# Round-4 batch E: k-core peeling, RAKE keyword extraction, Markov
# transition matrices.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.plans.graph import kcore_membership
from iniz_exporters_spark.operators.ranking import rake_keywords


# Bounded-round k-core peeling (Seidman 1983) over the co-purchase
# graph: 6 deterministic peels (converges in <=5 on every shipped scale,
# pinned in tests), CTE-per-round in the oracle — the Lloyd-rounds trade.
@register(
    "kcore_q",
    """
    WITH ed AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
           UNION ALL SELECT b AS src, a AS dst FROM ed),
    a1 AS MATERIALIZED (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= 80),
    e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
             JOIN a1 x ON e.src = x.src
             JOIN a1 y ON e.dst = y.src),
    a2 AS MATERIALIZED (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 80),
    e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
             JOIN a2 x ON e.src = x.src
             JOIN a2 y ON e.dst = y.src),
    a3 AS MATERIALIZED (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 80),
    e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
             JOIN a3 x ON e.src = x.src
             JOIN a3 y ON e.dst = y.src),
    a4 AS MATERIALIZED (SELECT src FROM e3 GROUP BY src HAVING COUNT(*) >= 80),
    e4 AS MATERIALIZED (SELECT e.src, e.dst FROM e3 e
             JOIN a4 x ON e.src = x.src
             JOIN a4 y ON e.dst = y.src),
    a5 AS MATERIALIZED (SELECT src FROM e4 GROUP BY src HAVING COUNT(*) >= 80),
    e5 AS MATERIALIZED (SELECT e.src, e.dst FROM e4 e
             JOIN a5 x ON e.src = x.src
             JOIN a5 y ON e.dst = y.src),
    a6 AS MATERIALIZED (SELECT src FROM e5 GROUP BY src HAVING COUNT(*) >= 80),
    e6 AS MATERIALIZED (SELECT e.src, e.dst FROM e5 e
             JOIN a6 x ON e.src = x.src
             JOIN a6 y ON e.dst = y.src)
    SELECT src AS node, COUNT(*) AS degree
    FROM e6 GROUP BY src HAVING COUNT(*) >= 80
    """,
)
def kcore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    return kcore_membership(edges, k=80, rounds=6)


# RAKE keyword extraction (Rose et al. 2010): document-local statistics,
# so the whole operator is corpus-parallel by construction.
@register(
    "rake_keywords_q",
    """
    WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
    tk AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks),
    g AS (SELECT doc_id, i, t[i] AS tok,
                 SUM(CASE WHEN t[i] IN ('the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','be','are','was','this','that','from') THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i) AS grp,
                 t[i] IN ('the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','be','are','was','this','that','from') AS is_stop
          FROM tk),
    wd AS (SELECT doc_id, i, tok, grp FROM g WHERE NOT is_stop),
    ph AS (SELECT doc_id, grp,
                  string_agg(tok, ' ' ORDER BY i) AS phrase,
                  COUNT(*) AS plen
           FROM wd GROUP BY doc_id, grp),
    ws AS (SELECT wd.doc_id, wd.tok, COUNT(*) AS freq,
                  SUM(ph.plen) AS deg
           FROM wd JOIN ph USING (doc_id, grp)
           GROUP BY wd.doc_id, wd.tok),
    sc AS (SELECT wd.doc_id, wd.grp,
                  CAST(ROUND(CAST(SUM(CAST(ws.deg::DOUBLE / ws.freq
                      AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
                      AS score
           FROM wd JOIN ws ON wd.doc_id = ws.doc_id AND wd.tok = ws.tok
           GROUP BY wd.doc_id, wd.grp),
    ded AS (SELECT sc.doc_id, ph.phrase, MAX(sc.score) AS score
            FROM sc JOIN ph USING (doc_id, grp)
            GROUP BY sc.doc_id, ph.phrase)
    SELECT doc_id, phrase, score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rn
          FROM ded)
    WHERE rn <= 3
    """,
)
def rake_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return rake_keywords(d, "doc_id", "text", top_n=3)


# First-order Markov transition matrix over per-user event sequences:
# the behavioral-analytics summary funnels/sessionization build on.
# One LEAD window + one count agg; probabilities are raw double count
# ratios (identical division both engines).
@register(
    "markov_transitions_q",
    """
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS dst
        FROM events
    )
    SELECT src, dst, COUNT(*) AS n,
           COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY src)
               AS prob
    FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    """,
)
def markov_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wsrc)).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch F: privacy audit, lakehouse compaction planning, sentence
# statistics, streaming EWMA (pytest-pinned; the batch twin is ewma_q).
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.privacy import k_anonymity_report


# k-anonymity / l-diversity audit over (nation, segment) quasi-identifiers
# with account balance sign as the sensitive attribute.
@register(
    "k_anonymity_q",
    """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_size,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) AS n_distinct_sensitive,
           COUNT(*) < 25 AS k_violation,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) <= 1 AS l1_leak
    FROM (SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer) t
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer.withColumn(
        "bal_sign",
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise("nonneg"),
    )
    return k_anonymity_report(
        c, ["c_nationkey", "c_mktsegment"], "bal_sign", k=25
    )


# Lakehouse compaction planning: order files largest-first, pack by
# cumulative size into target-sized output bins (the deterministic
# streaming analogue of first-fit-decreasing), and report each bin's
# fill. Runs entirely on the FILE-METADATA table — never touches data.
@register(
    "compaction_plan_q",
    """
    WITH files AS (
        SELECT 'part-' || LPAD(o_orderkey::VARCHAR, 9, '0') AS file,
               CAST(floor(o_totalprice * 100) AS BIGINT) % 134217728
                   AS bytes
        FROM orders WHERE o_orderkey % 7 = 3
    ),
    ordered AS (
        SELECT file, bytes,
               SUM(bytes) OVER (ORDER BY bytes DESC, file ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM files
    ),
    binned AS (
        SELECT file, bytes,
               CAST((cum - 1) // 268435456 AS BIGINT) AS bin
        FROM ordered
    )
    SELECT bin, COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(file) AS first_file
    FROM binned GROUP BY bin
    """,
)
def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    files = o.filter(F.col("o_orderkey") % 7 == 3).select(
        F.concat(
            F.lit("part-"), F.lpad(F.col("o_orderkey").cast("string"), 9, "0")
        ).alias("file"),
        (F.floor(F.col("o_totalprice") * 100).cast("long") % 134217728).alias(
            "bytes"
        ),
    )
    # global running sum over file METADATA (not data) — same deliberate
    # single-partition window as pareto_frontier_q
    w = Window.orderBy(F.col("bytes").desc(), F.col("file").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    binned = files.withColumn(
        "bin", F.expr(f"(sum(bytes) OVER (ORDER BY bytes DESC, file ASC "
                      f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                      f" - 1) div {256 * 1024 * 1024}")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file").alias("first_file"),
    )


# Sentence-level statistics: segmentation on terminal punctuation, pure
# per-row array expressions — the doc-structure signal quality filters
# (Gopher's "mean words per sentence") consume.
@register(
    "sentence_stats_q",
    """
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(text, '[.!?]+'),
                       x -> trim(x)),
                   x -> x <> '') AS sents
        FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(COALESCE(list_max(list_transform(sents, x -> length(x))), 0)
                AS BIGINT) AS max_sentence_chars,
           CAST(ROUND(CAST(COALESCE(
               list_sum(list_transform(sents, x -> length(x))), 0) AS DOUBLE)
               / greatest(len(sents), 1), 4) AS DOUBLE)
               AS mean_sentence_chars
    FROM s
    """,
)
def sentence_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    lens = F.transform(sents, lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.coalesce(F.array_max(lens), F.lit(0))
        .cast("long")
        .alias("max_sentence_chars"),
        F.round(
            F.coalesce(F.aggregate(lens, F.lit(0), lambda a, b: a + b), F.lit(0))
            .cast("double")
            / F.greatest(F.size(sents), F.lit(1)),
            4,
        ).alias("mean_sentence_chars"),
    )


# ===========================================================================
# Batch E — corpus statistics + LM smoothing layer.
#
# Shared FP-safety convention (established in bigram_logprob_q /
# benford_audit_q): every multi-term double summation is quantized to
# DECIMAL(28,12) per term BEFORE the sum so the total is independent of
# partition/merge order; per-row double arithmetic uses identical
# expression shapes in Spark and DuckDB so IEEE results agree bit-for-bit;
# final outputs round to <= 6 dp (inside the gate's 9-dp normalization).
# ===========================================================================


def _dsum(col):
    """Order-independent sum of a double expression (12-dp quantized)."""
    return F.sum(col.cast("decimal(28,12)"))


# Zipf's-law fit: OLS of ln(freq) on ln(rank) over the top-1000 vocabulary.
# Scale shape: token counting is a corpus-scale shuffle on the token key
# (map-side partials); everything after the top-k is VOCABULARY metadata —
# the rank window runs over <=1000 rows, and the regression is a closed-form
# fold over those rows. At 100 TB only the first groupBy grows.
@register(
    "zipf_fit_q",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok ASC)
                       AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM freq
        ORDER BY freq DESC, tok ASC LIMIT 1000
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                AS DOUBLE) AS slope,
           CAST(ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                      / n, 6) AS DOUBLE) AS intercept,
           CAST(ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                AS DOUBLE) AS r2
    FROM s
    """,
)
def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: a natural-language corpus shows slope
    near -1 on the log-log rank/frequency line; templated or synthetic
    spam bends it. The fit itself is exact OLS over the top-1000 ranks."""
    d = Catalog(spark, sf_dir).documents
    freq = (
        d.select(F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(1000)
    )
    # rank window over the collected top-k only (metadata scale)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    xy = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("x")).cast("double").alias("sx"),
        _dsum(F.col("y")).cast("double").alias("sy"),
        _dsum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        _dsum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        _dsum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# Heaps'-law growth curve: cumulative distinct vocabulary vs cumulative
# token count across ten corpus-order buckets. Scale shape: "first bucket
# a type appears in" is MIN(bucket) per token — one vocabulary-keyed
# shuffle; the cumulative curve is a 10-row window over the BUCKET table.
# No per-prefix distinct-count rescans (the naive formulation is 10 full
# corpus passes; this is one).
@register(
    "heaps_law_q",
    f"""
    WITH nd AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    t AS (
        SELECT CAST((doc_id * 10) // nd.nd AS BIGINT) AS bucket,
               unnest({_SQL_TOKENS}) AS tok
        FROM documents, nd
    ),
    tok_per_bucket AS (
        SELECT bucket, COUNT(*) AS n_tokens FROM t GROUP BY bucket
    ),
    first_seen AS (
        SELECT MIN(bucket) AS bucket, tok FROM t GROUP BY tok
    ),
    new_types AS (
        SELECT bucket, COUNT(*) AS n_new FROM first_seen GROUP BY bucket
    )
    SELECT b.bucket,
           CAST(SUM(b.n_tokens) OVER (ORDER BY b.bucket) AS BIGINT)
               AS cum_tokens,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY b.bucket)
                AS BIGINT) AS cum_types
    FROM tok_per_bucket b LEFT JOIN new_types n ON b.bucket = n.bucket
    """,
)
def heaps_law_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve; sub-linear growth is the
    natural-text signature, near-linear growth flags id-like/noisy token
    streams. The doc_id->bucket map uses the known dense id range (the
    oracle pins the same 500-row sf0.01 constant; Spark derives it)."""
    d = Catalog(spark, sf_dir).documents
    n_docs = d.agg((F.max("doc_id") + 1).alias("nd"))
    # the (bucket, tok) frame feeds two aggregations — pin it once so the
    # corpus-scale explode is not recomputed per consumer
    t = (
        d.crossJoin(F.broadcast(n_docs))
        .select(
            F.expr("(doc_id * 10) div nd").cast("long").alias("bucket"),
            F.explode(_tokens("text")).alias("tok"),
        )
        .transform(pin, eager=True)
    )
    per_bucket = t.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    new_types = (
        t.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_types"),
        )
    )


# Two-sample Kolmogorov–Smirnov distance between the doc-length
# distributions of two language cohorts. Scale shape: per-distinct-value
# counts are one shuffle on the value key (cardinality = distinct lengths,
# bounded by the length range, NOT the corpus); the ECDF window runs over
# that bounded value table. Counts stay integer until the final division,
# so the statistic is partition-order-proof.
@register(
    "ks_test_q",
    """
    WITH v AS (
        SELECT n_chars,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS cb
        FROM documents WHERE lang IN ('en', 'zh')
        GROUP BY n_chars
    ),
    e AS (
        SELECT SUM(ca) OVER (ORDER BY n_chars) AS cum_a,
               SUM(cb) OVER (ORDER BY n_chars) AS cum_b,
               SUM(ca) OVER () AS na,
               SUM(cb) OVER () AS nb
        FROM v
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / na
                              - CAST(cum_b AS DOUBLE) / nb)), 6) AS DOUBLE)
               AS ks_stat
    FROM e
    """,
)
def ks_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector (the CCNet/RefinedWeb shard-comparison
    check): sup-norm distance between two empirical CDFs, computed from
    per-value counts rather than sorted samples."""
    d = Catalog(spark, sf_dir).documents.filter(
        F.col("lang").isin("en", "zh")
    )
    v = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("lang") == "zh", 1).otherwise(0)).alias("cb"),
    )
    wc = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e = v.select(
        F.sum("ca").over(wc).alias("cum_a"),
        F.sum("cb").over(wc).alias("cum_b"),
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    return e.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("na")
                    - F.col("cum_b").cast("double") / F.col("nb")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


# Chi-square test of independence over the lang x source contingency
# table. Scale shape: one corpus-scale count shuffle into a cells table of
# |langs| x |sources| rows; marginals and the statistic are metadata-scale
# window/agg passes over that table. Expected counts are computed with the
# IDENTICAL expression shape both engines ((row*col)/N in integer->double),
# and cell terms are 12-dp-quantized before the final sum.
@register(
    "chi2_independence_q",
    """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS o
        FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, SUM(o) AS row_tot FROM cells GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS col_tot FROM cells GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM cells),
    -- FULL grid including structurally-zero cells: an absent
    -- (lang, source) pair still contributes its expected count E to the
    -- textbook statistic ((0-E)^2/E = E); an observed-cells-only sum
    -- understates chi2
    m AS (
        SELECT COALESCE(c.o, 0) AS o, rt.row_tot, ct.col_tot, tot.n
        FROM rt CROSS JOIN ct CROSS JOIN tot
        LEFT JOIN cells c ON rt.lang = c.lang AND ct.source = c.source
    ),
    d AS (
        SELECT COUNT(DISTINCT lang) AS nl, COUNT(DISTINCT source) AS ns
        FROM documents
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST((SELECT (nl - 1) * (ns - 1) FROM d) AS BIGINT) AS dof,
           CAST(ROUND(CAST(SUM(CAST(
               (CAST(o AS DOUBLE)
                - CAST(row_tot * col_tot AS DOUBLE) / n)
               * (CAST(o AS DOUBLE)
                  - CAST(row_tot * col_tot AS DOUBLE) / n)
               / (CAST(row_tot * col_tot AS DOUBLE) / n)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS chi2
    FROM m
    """,
)
def chi2_independence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix audit: is language independent of source? Large chi2
    localizes ingestion skew (a source that over-contributes one
    language). Sums over the FULL lang x source grid — a structurally
    absent pair contributes its expected count ((0-E)^2/E = E), the
    textbook Pearson statistic; summing observed cells only understates
    chi2 (caught by the brute-force cross-check, round 5). The grid is
    |langs| x |sources| metadata-scale rows from two broadcastable
    marginal tables, so the fix adds no data-scale shuffle."""
    d = Catalog(spark, sf_dir).documents
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("col_tot"))
    tot = cells.agg(F.sum("o").alias("n"))
    m = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["lang", "source"], "left")
        .select(
            F.coalesce("o", F.lit(0)).alias("o"),
            "row_tot",
            "col_tot",
            "n",
        )
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    term = (F.col("o").cast("double") - exp) * (
        F.col("o").cast("double") - exp
    ) / exp
    dims = d.agg(
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    )
    stat = m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(_dsum(term).cast("double"), 6).alias("chi2"),
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        "n_docs",
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long").alias("dof"),
        "chi2",
    )


# Interpolated Kneser–Ney bigram probabilities (d = 0.75) for the 30 most
# frequent bigrams. The production LM-smoothing statistic (Chen & Goodman
# 1999): continuation counts rather than raw counts back off the unigram.
# Scale shape: three aggregations over the (observed-)bigram table — by
# (w1,w2), by w1, by w2 — all vocabulary-keyed shuffles with map-side
# partials; scoring joins are vocab-keyed (AQE absorbs Zipf skew); the
# final top-30 is TakeOrdered. Per-row probability arithmetic is a single
# identical double expression in both engines — no FP summation at all.
@register(
    "kneser_ney_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1fwd
           FROM c12 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1bwd FROM c12 GROUP BY w2),
    tot AS (SELECT COUNT(*) AS n_types FROM c12)
    SELECT c12.w1, c12.w2, CAST(c12.c12 AS BIGINT) AS c,
           CAST(ROUND(
               (CAST(c12.c12 AS DOUBLE) - 0.75) / c1.c1
               + 0.75 * c1.n1fwd / c1.c1
                 * (CAST(cont.n1bwd AS DOUBLE) / tot.n_types), 6)
               AS DOUBLE) AS pkn
    FROM c12
    JOIN c1 ON c12.w1 = c1.w1
    JOIN cont ON c12.w2 = cont.w2
    CROSS JOIN tot
    ORDER BY c DESC, c12.w1, c12.w2
    LIMIT 30
    """,
)
def kneser_ney_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney (the strongest classical n-gram smoother):
    P(w2|w1) = max(c-d,0)/c(w1.) + d*N1+(w1,.)/c(w1.) * N1+(.,w2)/|types|.
    Every count >= 1 here (observed bigrams), so max(c-d,0) = c-d."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(_tokens("text").alias("t")).filter(F.size("t") >= 2)
    pairs = t.select(
        F.posexplode(F.slice("t", 1, F.size("t") - 1)).alias("i", "w1"),
        F.col("t"),
    ).select("w1", F.element_at("t", F.col("i") + 2).alias("w2"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1fwd")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n1bwd"))
    tot = c12.agg(F.count(F.lit(1)).alias("n_types"))
    pkn = (F.col("c12").cast("double") - 0.75) / F.col("c1") + 0.75 * F.col(
        "n1fwd"
    ) / F.col("c1") * (
        F.col("n1bwd").cast("double") / F.col("n_types")
    )
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c"),
            F.round(pkn, 6).alias("pkn"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(30)
    )


# Deterministic Poisson(1) bootstrap: 32 weighted replicas of the mean doc
# length per source, in ONE corpus pass. The per-(row, replica) weight is
# the inverse-CDF of Poisson(1) applied to a content-keyed uniform
# (poly_hash of "doc_id:replica"), so the estimate is partition-layout
# independent and reproducible — the distributed alternative to
# resample-with-replacement, which cannot shuffle 100 TB 32 times.
# Scale shape: 32x row explosion of (hash-input, n_chars) pairs only,
# one (source, replica) shuffle with integer map-side partials; the
# replica table (sources x 32) is metadata.
@register(
    "poisson_bootstrap_q",
    f"""
    WITH reps AS (
        SELECT source, n_chars, b,
               CAST({_SQL_POLY.format(
                   s="doc_id::VARCHAR || ':' || b::VARCHAR")} % 10000
                    AS DOUBLE) / 10000 AS u
        FROM documents, (SELECT unnest(range(0, 32)) AS b)
    ),
    weighted AS (
        SELECT source, b,
               CASE WHEN u < 0.367879 THEN 0
                    WHEN u < 0.735759 THEN 1
                    WHEN u < 0.919699 THEN 2
                    WHEN u < 0.981012 THEN 3
                    WHEN u < 0.996340 THEN 4
                    ELSE 5 END AS w,
               n_chars
        FROM reps
    ),
    replica_means AS (
        SELECT source, b,
               CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w) AS m
        FROM weighted GROUP BY source, b HAVING SUM(w) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_replicas,
           CAST(ROUND(CAST(SUM(CAST(m AS DECIMAL(28,12))) AS DOUBLE)
                      / COUNT(*), 4) AS DOUBLE) AS boot_mean,
           CAST(ROUND(MIN(m), 4) AS DOUBLE) AS boot_lo,
           CAST(ROUND(MAX(m), 4) AS DOUBLE) AS boot_hi
    FROM replica_means GROUP BY source
    """,
)
def poisson_bootstrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty quantification for corpus statistics at scale: each row
    contributes Poisson(1)-many copies to each replica (the streaming
    bootstrap used by production metric pipelines). Replica means divide
    two exact integer sums, so only the final 32-term mean needs the
    decimal quantization."""
    d = Catalog(spark, sf_dir).documents
    reps = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    ).withColumn(
        "u",
        (
            poly_hash(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 10000
        ).cast("double")
        / 10000,
    )
    w = (
        F.when(F.col("u") < 0.367879, 0)
        .when(F.col("u") < 0.735759, 1)
        .when(F.col("u") < 0.919699, 2)
        .when(F.col("u") < 0.981012, 3)
        .when(F.col("u") < 0.996340, 4)
        .otherwise(5)
    )
    replica_means = (
        reps.withColumn("w", w)
        .groupBy("source", "b")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("sw"),
            F.sum("w").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "source", (F.col("sw").cast("double") / F.col("n")).alias("m")
        )
    )
    return replica_means.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.round(_dsum(F.col("m")).cast("double") / F.count(F.lit(1)), 4).alias(
            "boot_mean"
        ),
        F.round(F.min("m"), 4).alias("boot_lo"),
        F.round(F.max("m"), 4).alias("boot_hi"),
    )


# Mutual information between token presence and document language, for the
# 20 highest-document-frequency tokens — the classic filter-method feature
# selector for quality/language classifiers. Scale shape: doc-level
# presence is one distinct (doc_id, tok) shuffle; the top-20 selection is
# TakeOrdered over the vocab table; the MI computation itself runs on a
# (20 x |langs| x {present,absent}) cell table — pure metadata. The
# absent-cell counts derive from marginals (no second corpus pass).
# Per-cell terms are 12-dp-quantized before the final sum; 0-count cells
# contribute 0 by the same CASE on both engines.
@register(
    "mi_feature_q",
    f"""
    WITH pres AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents
    ),
    top AS (
        SELECT tok, COUNT(*) AS df FROM pres GROUP BY tok
        ORDER BY df DESC, tok LIMIT 20
    ),
    langs AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
    n AS (SELECT COUNT(*) AS n FROM documents),
    joint AS (
        SELECT p.tok, d.lang, COUNT(*) AS n11
        FROM pres p
        JOIN top t ON p.tok = t.tok
        JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY p.tok, d.lang
    ),
    cells AS (
        SELECT t.tok, t.df, l.lang, l.nl, 1 AS present,
               COALESCE(j.n11, 0) AS c, t.df AS marg
        FROM top t CROSS JOIN langs l
        LEFT JOIN joint j ON j.tok = t.tok AND j.lang = l.lang
        UNION ALL
        SELECT t.tok, t.df, l.lang, l.nl, 0 AS present,
               l.nl - COALESCE(j.n11, 0) AS c, n.n - t.df AS marg
        FROM top t CROSS JOIN langs l CROSS JOIN n
        LEFT JOIN joint j ON j.tok = t.tok AND j.lang = l.lang
    )
    SELECT c.tok, CAST(MAX(c.df) AS BIGINT) AS df,
           CAST(ROUND(CAST(SUM(CAST(
               CASE WHEN c.c = 0 OR c.marg = 0 THEN 0.0 ELSE
                 (CAST(c.c AS DOUBLE) / n.n)
                 * log2(CAST(c.c AS DOUBLE) * n.n
                        / (CAST(c.marg AS DOUBLE) * c.nl))
               END AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS mi
    FROM cells c CROSS JOIN n
    GROUP BY c.tok
    """,
)
def mi_feature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(token-presence; lang) per candidate feature token. High-MI
    tokens are the language-discriminative vocabulary a lightweight
    fastText-style classifier would learn first."""
    d = Catalog(spark, sf_dir).documents
    # presence frame feeds both the top-k selection and the joint counts —
    # pin it once (distinct over the corpus-scale explode is the expensive
    # step; everything downstream is bounded by it)
    pres = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .distinct()
        .transform(pin, eager=True)
    )
    top = (
        pres.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(20)
    )
    langs = d.groupBy("lang").agg(F.count("*").alias("nl"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    joint = (
        pres.join(F.broadcast(top), "tok")
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("tok", "lang")
        .agg(F.count("*").alias("n11"))
    )
    grid = top.crossJoin(F.broadcast(langs)).join(
        F.broadcast(joint), ["tok", "lang"], "left"
    )
    present = grid.select(
        "tok",
        "df",
        "nl",
        F.coalesce(F.col("n11"), F.lit(0)).alias("c"),
        F.col("df").alias("marg"),
    )
    absent = grid.crossJoin(F.broadcast(n)).select(
        "tok",
        "df",
        "nl",
        (F.col("nl") - F.coalesce(F.col("n11"), F.lit(0))).alias("c"),
        (F.col("n") - F.col("df")).alias("marg"),
    )
    cells = present.unionByName(absent).crossJoin(F.broadcast(n))
    term = F.when(
        (F.col("c") == 0) | (F.col("marg") == 0), F.lit(0.0)
    ).otherwise(
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(
            F.col("c").cast("double")
            * F.col("n")
            / (F.col("marg").cast("double") * F.col("nl"))
        )
    )
    return cells.groupBy("tok").agg(
        F.max("df").cast("long").alias("df"),
        F.round(_dsum(term).cast("double"), 6).alias("mi"),
    )


# Entropy l-diversity audit over a joined quasi-identifier view: for each
# (nation, market-segment) equivalence class of customers, the Shannon
# entropy of the order-priority distribution of their orders. Classes with
# entropy below ln(2) cannot claim 2-diverse protection on the sensitive
# attribute. Scale shape: the customer->orders join shuffles on custkey
# (fact scale); the entropy computation runs per (class x priority) cell
# table — bounded by |classes| x 5. Complements k_anonymity_q (distinct-
# count l-diversity) with the entropy variant from Machanavajjhala 2007.
@register(
    "entropy_ldiversity_q",
    """
    WITH joined AS (
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT c_nationkey, c_mktsegment, o_orderpriority,
               COUNT(*) AS cnt
        FROM joined GROUP BY c_nationkey, c_mktsegment, o_orderpriority
    ),
    tot AS (
        SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n
        FROM cells GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c.c_nationkey, c.c_mktsegment, CAST(t.n AS BIGINT) AS n_orders,
           CAST(ROUND(CAST(SUM(CAST(
               -(CAST(c.cnt AS DOUBLE) / t.n)
               * ln(CAST(c.cnt AS DOUBLE) / t.n)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS entropy,
           CAST(SUM(CASE WHEN TRUE THEN 1 ELSE 0 END) AS BIGINT)
               AS n_priorities
    FROM cells c
    JOIN tot t ON c.c_nationkey = t.c_nationkey
              AND c.c_mktsegment = t.c_mktsegment
    GROUP BY c.c_nationkey, c.c_mktsegment, t.n
    """,
)
def entropy_ldiversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = cat.orders.join(
        cat.customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cells = joined.groupBy(
        "c_nationkey", "c_mktsegment", "o_orderpriority"
    ).agg(F.count("*").alias("cnt"))
    tot = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n")
    )
    p = F.col("cnt").cast("double") / F.col("n")
    return (
        cells.join(tot, ["c_nationkey", "c_mktsegment"])
        .groupBy("c_nationkey", "c_mktsegment", "n")
        .agg(
            F.round(_dsum(-p * F.log(p)).cast("double"), 6).alias(
                "entropy"
            ),
            F.count(F.lit(1)).cast("long").alias("n_priorities"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n").cast("long").alias("n_orders"),
            "entropy",
            "n_priorities",
        )
    )


# ===========================================================================
# Batch F — graph analytics, model-eval, and time-series decomposition.
# ===========================================================================


# Hot-basket guard for the basket-pair family (adamic_adar_q,
# association_rules_q): any self-join of (order, part) on the order key
# fans out quadratically per basket, so a single pathological 100k-item
# basket would emit 10^10 pairs from one shuffle key — the classic skew
# scale-killer. Every basket is therefore truncated to its BASKET_CAP
# smallest partkeys (deterministic; same ROW_NUMBER cap in the DuckDB
# oracle) BEFORE pairing, bounding per-key fan-out at BASKET_CAP^2.
# TPC-H baskets hold <= 7 distinct parts, so the cap never fires at test
# scale and oracle parity is exact. Fan-out bound pinned by
# tests/test_basket_cap.py.
BASKET_CAP = 64


def _capped_baskets(op: DataFrame, cap: int = BASKET_CAP) -> DataFrame:
    """Truncate each basket (key ``o``, item ``p``) to its ``cap`` smallest
    items. The per-key window is linear work per basket (one shuffle on
    ``o``, which the downstream pair join needs anyway)."""
    w = Window.partitionBy("o").orderBy("p")
    return (
        op.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


# Adamic–Adar link prediction over the co-purchase bipartite projection:
# parts are linked through shared orders, and each shared order z
# contributes 1/ln(|z|). Scale shape: the pair generator is keyed by
# orderkey, and every basket is HARD-CAPPED to its BASKET_CAP smallest
# partkeys (deterministic, applied identically in the oracle) before
# pairing — so one hot basket of 100k items contributes at most
# BASKET_CAP^2 pairs instead of 10^10, and total pair count is
# O(orders * BASKET_CAP^2). On TPC-H the cap is a no-op (baskets <= 7).
# Scores sum 12-dp-quantized terms, so the top-30 ordering is
# engine-identical. The cap's bounded-fan-out contract is pinned by
# tests/test_basket_cap.py (synthetic one-order x 5k-part hot basket).
@register(
    "adamic_adar_q",
    """
    WITH op0 AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    op AS (
        SELECT o, p FROM (
            SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
            FROM op0) WHERE rn <= 64
    ),
    osize AS (
        SELECT o, COUNT(*) AS n FROM op GROUP BY o HAVING COUNT(*) >= 2
    ),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb,
               CAST(1.0 / ln(CAST(s.n AS DOUBLE)) AS DECIMAL(28,12)) AS w
        FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p
        JOIN osize s ON s.o = a.o
    )
    SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(ROUND(CAST(SUM(w) AS DOUBLE), 6) AS DOUBLE) AS aa_score
    FROM pairs GROUP BY pa, pb
    ORDER BY SUM(w) DESC, pa, pb LIMIT 30
    """,
    headline=True,
)
def adamic_adar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 predicted part-part links by Adamic–Adar: pairs that share
    many small (informative) orders outrank pairs sharing few large
    (generic) ones. The common neighbor is always the ORDER node, whose
    degree is the order's distinct-part count (after the basket cap)."""
    li = Catalog(spark, sf_dir).lineitem
    # Pinned: three consumers (osize + both self-join sides) read the
    # capped baskets; unpinned, the scan + distinct + cap window ran three
    # times (r14-opt plan audit: 3× Scan parquet, 7 Exchanges → 1×/4).
    # Same shape as association_rules_q's eager pin of the identical frame.
    op = _capped_baskets(
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
    ).transform(pin, eager=True)
    osize = op.groupBy("o").agg(F.count("*").alias("n")).filter("n >= 2")
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .join(osize, "o")
        .select(
            "pa",
            "pb",
            (F.lit(1.0) / F.log(F.col("n").cast("double")))
            .cast("decimal(28,12)")
            .alias("w"),
        )
    )
    return (
        pairs.groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("w").alias("_aa"),
        )
        .orderBy(F.desc("_aa"), "pa", "pb")
        .limit(30)
        .select(
            "pa",
            "pb",
            "n_common",
            F.round(F.col("_aa").cast("double"), 6).alias("aa_score"),
        )
    )


# Per-node local clustering coefficient over the co-purchase graph:
# 2*T(v) / (d(v)*(d(v)-1)). Reuses the degree-oriented triangle
# enumeration (skew-proof wedge join, out-degree <= O(sqrt E)), but keeps
# the triangle's three corners and explodes them — one extra
# vocabulary-scale shuffle to count per-node triangles. Everything is
# integer until the final coefficient.
@register(
    "clustering_coeff_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    ed AS (
        SELECT e.a, e.b, da.d AS da, db.d AS db
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    oriented AS (
        SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
               CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dd
        FROM ed
    ),
    tri AS (
        -- the wedge orders (o1.dd,o1.dst) < (o2.dd,o2.dst), and oriented
        -- stores every edge with src = the degree-lower endpoint, so the
        -- closing edge y--z is stored exactly as (src=y, dst=z): probe
        -- with the degree-ordered key (id-ordered LEAST/GREATEST would
        -- miss triangles where deg(y)<deg(z) but y>z numerically)
        SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
        FROM oriented o1
        JOIN oriented o2 ON o1.src = o2.src
                        AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
        JOIN oriented c
          ON c.src = o1.dst AND c.dst = o2.dst
    ),
    pernode AS (
        SELECT n, COUNT(*) AS t FROM (
            SELECT x AS n FROM tri UNION ALL
            SELECT y AS n FROM tri UNION ALL
            SELECT z AS n FROM tri) u
        GROUP BY n
    )
    SELECT d.n AS node, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
           CAST(ROUND(CASE WHEN d.d >= 2 THEN
                    2.0 * COALESCE(p.t, 0) / (d.d * (d.d - 1))
                    ELSE 0.0 END, 6) AS DOUBLE) AS coeff
    FROM deg d LEFT JOIN pernode p ON p.n = d.n
    ORDER BY COALESCE(p.t, 0) DESC, d.n LIMIT 30
    """,
)
def clustering_coeff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    # edge list feeds degree + orientation — pin once
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .transform(pin, eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .transform(pin, eager=True)
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lt, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ).transform(pin, eager=True)
    o1 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("dd").alias("dy")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("z"), F.col("dd").alias("dz")
    )
    wedges = o1.join(o2, "src").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closure = oriented.select(
        F.col("src").alias("cs"), F.col("dst").alias("cd")
    )
    # wedge filter guarantees (dy,y) < (dz,z) in DEGREE order, and every
    # edge in `oriented` is stored with src = its degree-lower endpoint —
    # so the closing edge y--z sits at exactly (src=y, dst=z). Probing
    # with id-ordered least/greatest keys would drop triangles where
    # deg(y) < deg(z) but y > z numerically.
    tri = wedges.join(
        closure,
        (F.col("cs") == F.col("y")) & (F.col("cd") == F.col("z")),
    ).select("src", "y", "z")
    pernode = (
        tri.select(F.explode(F.array("src", "y", "z")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("t"))
    )
    t = F.coalesce(F.col("t"), F.lit(0))
    return (
        deg.join(pernode, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").cast("long").alias("degree"),
            t.cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("d") >= 2,
                    2.0 * t / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("coeff"),
        )
        .orderBy(F.desc("n_triangles"), "node")
        .limit(30)
    )


# Gini coefficient of document length per source — the corpus-inequality
# audit (a source whose token mass concentrates in a few giant docs skews
# sampling weights). Scale shape: one rank window PER SOURCE partition
# (parallel across sources), then integer aggregates: G =
# 2*sum(i*x_i)/(n*sum x) - (n+1)/n stays in exact integer arithmetic
# until the final division.
@register(
    "gini_q",
    """
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(ROUND(2.0 * SUM(i * n_chars)
                      / (COUNT(*) * SUM(n_chars))
                      - (COUNT(*) + 1.0) / COUNT(*), 6) AS DOUBLE)
               AS gini
    FROM ranked GROUP BY source
    """,
)
def gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini from GROUPED VALUE COUNTS, not per-row ranks: a tie block of
    c equal values occupying ranks cum+1..cum+c contributes
    v * (c*cum + c(c+1)/2) to the rank-weighted sum, so the oracle's
    ROW_NUMBER formulation is reproduced EXACTLY (integer arithmetic,
    ties commute) while the window runs over the per-source distinct
    VALUE table — bounded cardinality — instead of ranking the corpus
    inside per-source partitions (the gini-at-100TB scale trap)."""
    d = Catalog(spark, sf_dir).documents
    pv = d.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    wv = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_before = F.sum("c").over(wv) - F.col("c")
    block_rank_sum = F.col("c") * cum_before + F.expr(
        "c * (c + 1) DIV 2"
    )
    terms = pv.select(
        "source",
        "c",
        (F.col("c") * F.col("n_chars")).alias("mass"),
        (F.col("n_chars").cast("long") * block_rank_sum).alias("si"),
    )
    n = F.sum("c")
    return terms.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum("mass").cast("long").alias("total_chars"),
        F.round(
            2.0 * F.sum("si") / (n * F.sum("mass")) - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


# ROC-AUC of a deterministic quality score (mean token length) against the
# lang='en' label, computed from per-distinct-score counts — the
# rank-free Mann–Whitney formulation that never sorts the corpus:
# AUC = sum_s [P(s) * (cumN(<s) + N(s)/2)] / (P_tot * N_tot).
# Scale shape: one shuffle keyed by the (4-dp-rounded) score value —
# bounded cardinality — then a window over that score table. Counts stay
# integer; N(s)/2 is exact in binary.
@register(
    "roc_auc_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    per_score AS (
        SELECT s, SUM(y) AS np, SUM(1 - y) AS nn
        FROM scored GROUP BY s
    ),
    c AS (
        SELECT np, nn,
               SUM(nn) OVER (ORDER BY s) - nn AS cum_nn_below,
               SUM(np) OVER () AS p_tot, SUM(nn) OVER () AS n_tot
        FROM per_score
    )
    SELECT CAST(MAX(p_tot) AS BIGINT) AS n_pos,
           CAST(MAX(n_tot) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(SUM(CAST(
               np * (cum_nn_below + nn / 2.0)
               AS DECIMAL(28,12))) AS DOUBLE)
               / (MAX(p_tot) * MAX(n_tot)), 6) AS DOUBLE) AS auc
    FROM c
    """,
)
def roc_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free evaluation of a per-doc score as an 'is English'
    classifier. AUC from grouped counts: ties handled by the standard
    half-credit term, no global sort of documents."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per_score.select(
        "np",
        "nn",
        (F.sum("nn").over(wc) - F.col("nn")).alias("cum_nn_below"),
        F.sum("np").over(wt).alias("p_tot"),
        F.sum("nn").over(wt).alias("n_tot"),
    )
    return c.agg(
        F.max("p_tot").cast("long").alias("n_pos"),
        F.max("n_tot").cast("long").alias("n_neg"),
        F.round(
            _dsum(
                F.col("np") * (F.col("cum_nn_below") + F.col("nn") / 2.0)
            ).cast("double")
            / (F.max("p_tot") * F.max("n_tot")),
            6,
        ).alias("auc"),
    )


# Weekly seasonal decomposition of the daily event-value series (STL-lite:
# trend = centered 7-day moving average, seasonal = mean detrended value
# per day-of-week, residual = remainder). Scale shape: the corpus-scale
# work is one (day) aggregation with map-side partials; all three window
# passes run over the DAILY table (calendar-bounded metadata — 30 rows
# here, ~36.5k rows for a century). Daily means are quantized to
# DECIMAL(18,6) before the sliding sum so the moving average is
# partition- and tree-order-proof on both engines.
@register(
    "stl_decompose_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
    ),
    trended AS (
        SELECT day, dow, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DECIMAL(18,6)) AS trend
        FROM daily
    ),
    seasoned AS (
        SELECT day, dow, m, trend,
               CAST(CAST(SUM(m - trend) OVER (PARTITION BY dow)
                    AS DOUBLE) / COUNT(*) OVER (PARTITION BY dow)
                    AS DECIMAL(18,6)) AS seasonal
        FROM trended
    )
    SELECT day,
           CAST(ROUND(CAST(m AS DOUBLE), 4) AS DOUBLE) AS daily_mean,
           CAST(ROUND(CAST(trend AS DOUBLE), 4) AS DOUBLE) AS trend,
           CAST(ROUND(CAST(seasonal AS DOUBLE), 4) AS DOUBLE) AS seasonal,
           CAST(ROUND(CAST(m - trend - seasonal AS DOUBLE), 4) AS DOUBLE)
               AS residual
    FROM seasoned
    """,
)
def stl_decompose_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition on the daily aggregate —
    the observability layer's anomaly-vs-seasonality separator. Exact
    decimal arithmetic end-to-end: every intermediate (daily mean, trend,
    seasonal) re-quantizes to DECIMAL(18,6)."""
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "view")
    daily = (
        e.groupBy(
            F.to_date("ts").alias("day"),
            (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
             ).alias("dow"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            )
            .cast("decimal(18,6)")
            .alias("m")
        )
    )
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "dow",
        "m",
        (F.sum("m").over(wma).cast("double") / F.count("*").over(wma))
        .cast("decimal(18,6)")
        .alias("trend"),
    )
    wd = Window.partitionBy("dow").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seasoned = trended.select(
        "day",
        "m",
        "trend",
        (
            F.sum(F.col("m") - F.col("trend")).over(wd).cast("double")
            / F.count("*").over(wd)
        )
        .cast("decimal(18,6)")
        .alias("seasonal"),
    )
    return seasoned.select(
        "day",
        F.round(F.col("m").cast("double"), 4).alias("daily_mean"),
        F.round(F.col("trend").cast("double"), 4).alias("trend"),
        F.round(F.col("seasonal").cast("double"), 4).alias("seasonal"),
        F.round(
            (F.col("m") - F.col("trend") - F.col("seasonal")).cast("double"),
            4,
        ).alias("residual"),
    )


# CUSUM change-point curve over the daily error-rate series: cumulative
# sum of (daily mean - global mean), with the argmax |CUSUM| day flagged.
# Scale shape: identical to stl_decompose_q — one corpus-scale day
# aggregation, then windows over the calendar-bounded daily table. All
# sums run in exact decimal, so the flagged change point cannot flap
# across engines or partition layouts.
@register(
    "cusum_changepoint_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'error'
        GROUP BY CAST(ts AS DATE)
    ),
    mu AS (
        SELECT day, m,
               CAST(CAST(SUM(m) OVER () AS DOUBLE) / COUNT(*) OVER ()
                    AS DECIMAL(18,6)) AS mu
        FROM daily
    ),
    c AS (
        SELECT day, m, SUM(m - mu) OVER (ORDER BY day) AS cusum
        FROM mu
    )
    SELECT day,
           CAST(ROUND(CAST(m AS DOUBLE), 4) AS DOUBLE) + 0.0 AS daily_mean,
           CAST(ROUND(CAST(cusum AS DOUBLE), 4) AS DOUBLE) + 0.0 AS cusum,
           ABS(cusum) = MAX(ABS(cusum)) OVER () AS is_changepoint
    FROM c
    """,
)
def cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "error")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mu = daily.select(
        "day",
        "m",
        (F.sum("m").over(wt).cast("double") / F.count("*").over(wt))
        .cast("decimal(18,6)")
        .alias("mu"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = mu.select(
        "day", "m", F.sum(F.col("m") - F.col("mu")).over(wc).alias("cusum")
    )
    # ``+ 0.0`` normalizes IEEE negative zero: a tiny negative CUSUM rounds
    # to -0.0 in DuckDB but +0.0 in Spark (BigDecimal path) — numerically
    # equal yet different under the driver's string-hash (r7 red row).
    return c.select(
        "day",
        (F.round(F.col("m").cast("double"), 4) + F.lit(0.0)).alias(
            "daily_mean"
        ),
        (F.round(F.col("cusum").cast("double"), 4) + F.lit(0.0)).alias(
            "cusum"
        ),
        (F.abs("cusum") == F.max(F.abs("cusum")).over(wt)).alias(
            "is_changepoint"
        ),
    )


# Last-touch attribution: each purchase is credited to the user's most
# recent non-purchase event within the preceding 7 days. Scale shape: one
# window pass per user partition (running max of a (ts, id, type) struct
# over preceding rows) — no self-join of the event stream; the fact table
# shuffles once on user_id. The oracle states the same semantics as a
# bounded join + arg_max, which is equivalent because "most recent within
# 7d" = "most recent overall, if within 7d".
@register(
    "attribution_q",
    """
    SELECT event_id, user_id, src_event_id, src_type, us_before FROM (
        SELECT p.event_id, p.user_id,
               e.event_id AS src_event_id, e.event_type AS src_type,
               epoch_us(p.ts) - epoch_us(e.ts) AS us_before,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY e.ts DESC, e.event_id DESC)
                   AS rn
        FROM events p
        LEFT JOIN events e
          ON e.user_id = p.user_id AND e.event_type <> 'purchase'
         AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 7 DAY
        WHERE p.event_type = 'purchase'
    ) t WHERE rn = 1
    """,
)
def attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    # RANGE frame on microseconds ending at -1: strictly-earlier events
    # only. A ROWS frame ordered by (ts, event_id) would also admit a
    # same-timestamp source event with a smaller event_id, which the
    # oracle's e.ts < p.ts excludes — the two diverge on per-user ts ties.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    attr = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
            ),
        )
    ).over(w)
    flagged = ev.select(
        "event_id", "user_id", "event_type", "ts", attr.alias("a")
    ).filter(F.col("event_type") == "purchase")
    within = F.col("a").isNotNull() & (
        F.col("a.ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.when(within, F.col("a.event_id")).alias("src_event_id"),
        F.when(within, F.col("a.event_type")).alias("src_type"),
        F.when(
            within, F.unix_micros("ts") - F.unix_micros("a.ts")
        ).alias("us_before"),
    )


# ColBERT-style late-interaction (MaxSim) retrieval: passages are groups
# of 10 vectors; score(q, d) = sum over query tokens of the best cosine
# against any doc token. Scale shape: the 20 query-token vectors
# BROADCAST against the corpus token table (corpus never shuffles for
# scoring); the max-per-(query-token, passage) and the final sum shuffle
# only (qid, did, score) rows — passage-scale, not token-pair-scale.
# Cosines round to 4 dp before max (ties break identically), and the
# 10-term MaxSim sum is 12-dp-quantized.
@register(
    "maxsim_q",
    """
    WITH e AS (SELECT vec_id, vec_id // 10 AS pid,
                      embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT pid AS qid, vec_id AS qtok, v AS qv FROM e WHERE pid < 2),
    c AS (SELECT pid AS did, v FROM e WHERE pid >= 2),
    cos AS (
        SELECT q.qid, c.did, q.qtok,
               MAX(ROUND(list_cosine_similarity(q.qv, c.v), 4)) AS best
        FROM q JOIN c ON TRUE
        GROUP BY q.qid, c.did, q.qtok
    ),
    scored AS (
        SELECT qid, did,
               CAST(ROUND(CAST(SUM(CAST(best AS DECIMAL(28,12)))
                    AS DOUBLE), 4) AS DOUBLE) AS maxsim
        FROM cos GROUP BY qid, did
    )
    SELECT qid, did, maxsim, rn FROM (
        SELECT qid, did, maxsim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY maxsim DESC, did) AS rn
        FROM scored
    ) t WHERE rn <= 5
    """,
    headline=True,
)
def maxsim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.similarity import (
        scored_vs_fixed_queries,
    )

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        (F.col("vec_id") / 10).cast("long").alias("pid"),
        F.col("embedding"),
    )
    # The 20 query-token vectors are a FIXED query set; scoring runs
    # through the vectorized matmul kernel (guide §4.2) instead of a
    # per-pair HOF cosine — the broadcast-nested-loop shape's 40k
    # zip_with/aggregate folds (each recomputing both norms) become one
    # BLAS block per Arrow batch. Scoring follows the family's documented
    # convention (dot-then-divide + round, as _topk_in_block); parity with
    # the old HOF expression is oracle-gated, not by construction (ADVICE
    # r14: np.round half-to-even + BLAS accumulation order). The corpus
    # still never shuffles for scoring.
    scored = scored_vs_fixed_queries(
        e.filter(F.col("pid") >= 2),
        e.filter(F.col("pid") < 2),
        id_col="vec_id",
        vec_col="embedding",
        round_to=4,
        what="maxsim_q",
        corpus_out="cvid",
        query_out="qtok",
    )
    cos = (
        scored.groupBy(
            (F.col("qtok") / 10).cast("long").alias("qid"),
            (F.col("cvid") / 10).cast("long").alias("did"),
            "qtok",
        )
        .agg(F.max("cos").alias("best"))
    )
    scored = cos.groupBy("qid", "did").agg(
        F.round(_dsum(F.col("best")).cast("double"), 4).alias("maxsim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim"), "did")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "did", "maxsim", "rn")
    )


# Sweep-line interval concurrency: how many order lines are simultaneously
# in fulfillment (order date .. ship date inclusive), reported as the
# per-month peak. Scale shape: the classic O(n^2) interval-overlap join is
# replaced by +1/-1 boundary events aggregated per DAY (one corpus-scale
# shuffle onto a calendar-bounded key), a running sum over the bounded
# date table, and a month rollup. Integers throughout.
@register(
    "interval_concurrency_q",
    """
    WITH iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS s,
               CAST(l.l_shipdate AS DATE) AS e
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    bounds AS (
        SELECT s AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT e + 1 AS day, -1 FROM iv
    ),
    daily AS (
        SELECT day, SUM(delta) AS delta FROM bounds GROUP BY day
    ),
    open_count AS (
        SELECT day, SUM(delta) OVER (ORDER BY day) AS n_open
        FROM daily
    )
    SELECT CAST(EXTRACT(YEAR FROM day) * 100 + EXTRACT(MONTH FROM day)
                AS BIGINT) AS ym,
           CAST(MAX(n_open) AS BIGINT) AS peak_open,
           CAST(COUNT(*) AS BIGINT) AS n_boundary_days
    FROM open_count GROUP BY 1
    """,
)
def interval_concurrency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    iv = cat.lineitem.select("l_orderkey", "l_shipdate").join(
        cat.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    starts = iv.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("delta"),
    )
    ends = iv.select(
        F.date_add(F.col("l_shipdate").cast("date"), 1).alias("day"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        starts.unionAll(ends).groupBy("day").agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    open_count = daily.select(
        "day", F.sum("delta").over(w).alias("n_open")
    )
    return open_count.groupBy(
        (F.year("day") * 100 + F.month("day")).cast("long").alias("ym")
    ).agg(
        F.max("n_open").cast("long").alias("peak_open"),
        F.count(F.lit(1)).cast("long").alias("n_boundary_days"),
    )


# Boilerplate/template detection: documents sharing an identical 8-token
# prefix hash. Scale shape: the prefix hash is per-row Catalyst (poly_hash
# over the joined prefix tokens); only (prefix_hash, doc_id, source) rows
# shuffle — text never moves; groups are template-cluster scale.
@register(
    "template_prefix_q",
    f"""
    WITH p AS (
        SELECT doc_id, source,
               {_SQL_POLY.format(
                   s="array_to_string(list_slice(" + _SQL_TOKENS + ", 1, 8), ' ')")}
                   AS prefix_hash
        FROM documents
        WHERE len({_SQL_TOKENS}) >= 8
    )
    SELECT prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS sample_doc
    FROM p GROUP BY prefix_hash HAVING COUNT(*) >= 2
    """,
)
def template_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs opening with the same 8 tokens are template/boilerplate
    candidates (the pre-filter for CCNet-style boilerplate removal).
    Cross-source groups are the strongest signal (mirrors, syndication)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    p = d.filter(F.size(t) >= 8).select(
        "doc_id",
        "source",
        poly_hash(F.array_join(F.slice(t, 1, 8), " ")).alias("prefix_hash"),
    )
    return (
        p.groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("sample_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# Power-law (Pareto) tail fit of the co-purchase degree distribution via
# the Hill MLE: alpha = 1 + n / sum(ln(d / dmin)) over degrees >= dmin.
# Scale shape: degrees come from one edge aggregation (vocab-scale); the
# estimator is a single fold over the degree table with 12-dp-quantized
# log terms. Companion to zipf_fit_q (token side) for graph data.
@register(
    "degree_powerlaw_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    tail AS (SELECT d FROM deg WHERE d >= 2)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(MAX(d) AS BIGINT) AS d_max,
           -- degenerate tail (every degree == dmin) => log-sum is 0:
           -- the Hill estimator is undefined, return NULL (both engines)
           CAST(CASE WHEN CAST(SUM(CAST(ln(CAST(d AS DOUBLE) / 2.0)
                    AS DECIMAL(28,12))) AS DOUBLE) > 0 THEN
               ROUND(1.0 + COUNT(*) / CAST(SUM(CAST(
                   ln(CAST(d AS DOUBLE) / 2.0)
                   AS DECIMAL(28,12))) AS DOUBLE), 6)
           END AS DOUBLE) AS alpha_hill
    FROM tail
    """,
)
def degree_powerlaw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .transform(pin, eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .transform(pin, eager=True)
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    tail = deg.filter(F.col("d") >= 2)
    # degenerate tail (every degree == dmin=2): log-sum is 0 and the Hill
    # estimator is undefined — return NULL, matching the oracle's CASE
    logsum = _dsum(F.log(F.col("d").cast("double") / 2.0)).cast("double")
    stats = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.max("d").cast("long").alias("d_max"),
        F.when(
            logsum > 0,
            F.round(1.0 + F.count(F.lit(1)) / logsum, 6),
        ).alias("alpha_hill"),
    )
    return n_nodes.crossJoin(F.broadcast(stats)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_tail",
        "d_max",
        "alpha_hill",
    )


# Sequential pattern mining: the 20 most common length-3 event-type paths
# per user stream (the next-event-prediction training signal). Scale
# shape: two LEAD windows per user partition (parallel across users, no
# self-join of the stream), then a path-keyed count — path vocabulary is
# |types|^3 bounded.
@register(
    "event_paths_q",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3 LIMIT 20
    """,
)
def event_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        ordered.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


# ===========================================================================
# Batch H — clustering-quality evaluation (internal + external indices).
# All three reuse the deterministic 2-round Lloyd model: the oracle
# replays init -> assign -> recompute -> assign in SQL exactly as
# kmeans_assignments does; Spark gets the same k x d centroid table from
# lloyd_train (metadata collect) and evaluates per-row with broadcast
# centroid literals. Distances round to 6 dp (the model's contract), so
# assignment and index arithmetic are engine-identical.
# ===========================================================================

from iniz_exporters_spark.operators.clustering import lloyd_train  # noqa: E402


_KM_PRELUDE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
           FROM e ORDER BY vec_id LIMIT 4),
    a0 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    m0 AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(m ORDER BY i) AS v FROM m0 GROUP BY cid),
    dists AS (
        SELECT e.vec_id, e.v, c.cid, {_KM_DIST} AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_DIST}, c.cid) AS rn
        FROM e CROSS JOIN c1 c
    )
"""


def _km_eval_frame(spark: SparkSession, sf_dir: str):
    """((vec_id, label, v, cluster, d2_own, d2_other) frame, centroids)
    under the shared 2-round Lloyd model — centroids broadcast as
    literals, all distance arithmetic in the same fold shape as the SQL
    replay."""
    emb = Catalog(spark, sf_dir).embeddings
    cents = lloyd_train(emb, "vec_id", "embedding", k=4, iters=2)
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dcols = []
    for i, c in enumerate(cents):
        cent = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), cent, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )
        dcols.append(F.struct(d2.alias("d"), F.lit(i).alias("cid")))
    arr = F.array(*dcols)
    best = F.array_min(arr)
    frame = e.select(
        "vec_id",
        "label",
        "v",
        best["cid"].alias("cluster"),
        best["d"].alias("d2_own"),
        F.array_min(
            F.filter(arr, lambda s: s["cid"] != best["cid"])
        )["d"].alias("d2_other"),
    )
    return frame, cents


# Simplified (centroid-based) silhouette per cluster: s = (b - a) /
# max(a, b) with a = distance to own centroid, b = nearest other
# centroid. Scale shape: O(n*k) per-row arithmetic against broadcast
# centroids — no pairwise point distances (the textbook silhouette is
# O(n^2) and cannot run at corpus scale); one k-row aggregation.
@register(
    "silhouette_q",
    _KM_PRELUDE
    + """
    , pts AS (
        SELECT vec_id,
               MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
               sqrt(MAX(CASE WHEN rn = 1 THEN d2 END)) AS da,
               sqrt(MIN(CASE WHEN rn > 1 THEN d2 END)) AS db
        FROM dists GROUP BY vec_id
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(CAST(SUM(CAST(
               CASE WHEN greatest(da, db) > 0
                    THEN (db - da) / greatest(da, db) ELSE 0.0 END
               AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS mean_silhouette
    FROM pts GROUP BY cluster
    """,
)
def silhouette_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    f, _ = _km_eval_frame(spark, sf_dir)
    da, db = F.sqrt("d2_own"), F.sqrt("d2_other")
    s = F.when(
        F.greatest(da, db) > 0, (db - da) / F.greatest(da, db)
    ).otherwise(0.0)
    return f.groupBy(F.col("cluster").cast("int").alias("cluster")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(_dsum(s).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_silhouette"
        ),
    )


# Calinski–Harabasz index: between-cluster dispersion over within-cluster
# dispersion, (B/(k-1)) / (W/(n-k)). Scale shape: W is the sum of the
# per-point own-centroid distances already computed; B needs only the
# k x d centroid table and the global mean (metadata arithmetic). One
# corpus aggregation total.
@register(
    "calinski_harabasz_q",
    _KM_PRELUDE
    + """
    , own AS (
        SELECT vec_id, v, cid, d2 FROM dists WHERE rn = 1
    ),
    w AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(d2 AS DECIMAL(28,12))) AS DOUBLE) AS wss
        FROM own
    ),
    sizes AS (SELECT cid, COUNT(*) AS nj FROM own GROUP BY cid),
    gmean AS (
        SELECT i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS g
        FROM (SELECT i, v[i] AS val
              FROM e, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY i
    ),
    b AS (
        SELECT CAST(SUM(CAST(s.nj * ROUND(
                   list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - g.gv[i]) * (c.v[i] - g.gv[i])),
                       (x, y) -> x + y), 6)
               AS DECIMAL(28,12))) AS DOUBLE) AS bss
        FROM c1 c JOIN sizes s ON c.cid = s.cid
        CROSS JOIN (SELECT list(g ORDER BY i) AS gv FROM gmean) g
    )
    SELECT CAST(w.n AS BIGINT) AS n,
           CAST(ROUND(w.wss, 4) AS DOUBLE) AS wss,
           CAST(ROUND(b.bss, 4) AS DOUBLE) AS bss,
           CAST(ROUND((b.bss / 3) / (w.wss / (w.n - 4)), 6) AS DOUBLE)
               AS ch_index
    FROM w CROSS JOIN b
    """,
)
def calinski_harabasz_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    f, cents = _km_eval_frame(spark, sf_dir)
    f = f.transform(pin, eager=True)
    w = f.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("d2_own")).cast("double").alias("wss"),
    )
    sizes = f.groupBy("cluster").agg(F.count("*").alias("nj"))
    gmean_rows = (
        emb.select(F.posexplode("embedding").alias("i", "val"))
        .groupBy("i")
        .agg(
            F.round(F.avg(F.col("val").cast("double")).cast("decimal(28,12)"), 6)
            .cast("double")
            .alias("g")
        )
        .collect()  # d rows — metadata
    )
    g = [0.0] * len(gmean_rows)
    for r in gmean_rows:
        g[r["i"]] = r["g"]
    bss_terms = []
    for i, c in enumerate(cents):
        d2 = round(sum((a - b) * (a - b) for a, b in zip(c, g)), 6)
        bss_terms.append((i, d2))
    bt = metadata_df(spark, bss_terms, "cid int, d2 double")
    b = (
        sizes.join(F.broadcast(bt), sizes.cluster == bt.cid)
        .agg(
            _dsum(F.col("nj") * F.col("d2")).cast("double").alias("bss")
        )
    )
    return w.crossJoin(F.broadcast(b)).select(
        F.col("n").cast("long").alias("n"),
        F.round("wss", 4).alias("wss"),
        F.round("bss", 4).alias("bss"),
        F.round(
            (F.col("bss") / 3) / (F.col("wss") / (F.col("n") - 4)), 6
        ).alias("ch_index"),
    )

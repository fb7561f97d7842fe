"""Registry chunk 11: round-12 LLM-pipeline batch (7 @register entries).

Exact-substring dedup and train→test decontamination at the
suffix-array level (Lee et al. 2021 §4 / §6.2), quality-classifier
calibration + keep-threshold operating characteristic over the
curation scores, GPT-style concatenate-and-chunk sequence-packing
accounting, embedding-level train/test decontamination, and
data-constrained epoch planning (Muennighoff et al. 2023, R*=15.4).
Registration order continues the registry; see queries/__init__.py for
the chunk re-export contract.
"""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import register
from iniz_exporters_spark.functions.text import poly_hash, tokens
from iniz_exporters_spark.operators.quality import linear_quality_score
from iniz_exporters_spark.operators.indexing import global_cumsum
from iniz_exporters_spark.operators.similarity import (
    _broadcast_guard,
    dot,
    norm,
)
from iniz_exporters_spark.queries.p01 import _SQL_POLY, _SQL_TOKENS
from iniz_exporters_spark.queries.p02 import _SQL_QW
from iniz_exporters_spark.session import spread_for_kernel as _spread
from iniz_exporters_spark.pinning import pin
from iniz_exporters_spark.session import metadata_df

# Exact-substring dedup constants (Lee et al. 2021 §4: ExactSubstr
# removes substrings >= 50 tokens shared between documents; the
# suffix-array pass is re-expressed as k-token seed matches chained
# along (docA, docB, diagonal) runs — a maximal cross-doc duplicated
# substring of length T >= SEED corresponds EXACTLY to a run of
# T-SEED+1 consecutive seed matches at one diagonal, so for the >= 50
# threshold the relational plan reproduces the suffix-array answer).
_ESD_SEED = 8
_ESD_TRIM = 50
# Seed-join fan-out bound, IN THE PLAN (not just documented): grams with
# more than this many occurrences corpus-wide are excluded from the
# self-join — each such gram would seed O(occ²) candidate pairs, the
# quadratic blow-up class the ngram-Jaccard prefix machinery bounds with
# df-ordering. Grams past the cap are boilerplate-scale duplication,
# which the doc-level dedup family (bff/chunk/minhash) already owns; at
# every gated scale the corpus-wide max occurrence is 3, so the cap is
# value-invisible there (re-gated after adding it). Spelled identically
# in both engines.
_ESD_OCC_CAP = 1000

# Sequence packing: fixed training context length (tokens).
_PACK_LEN = 128

# Embedding decontamination: FIXED-SIZE eval suite (the 32 vectors with
# the smallest content hash — a benchmark's size does not grow with the
# training corpus, which is what keeps the operator linear); cosine
# threshold calibrated so both gate scales produce mixed flags.
_DECON_K = 32
_DECON_TAU = 0.40


@register(
    "exact_substring_dedup_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    seeds AS (
        SELECT doc_id, u.i AS pos,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 2}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED}
    ),
    bounded AS (
        SELECT doc_id, pos, g FROM (
            SELECT doc_id, pos, g,
                   COUNT(*) OVER (PARTITION BY g) AS occ
            FROM seeds)
        WHERE occ <= {_ESD_OCC_CAP}
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM bounded a JOIN bounded b
          ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT da, db, diag, pa,
               pa - ROW_NUMBER() OVER (
                   PARTITION BY da, db, diag ORDER BY pa) AS rk
        FROM pairs
    ),
    spans AS (
        SELECT da, db, diag, MIN(pa) AS sa,
               COUNT(*) + {_ESD_SEED - 1} AS span_len
        FROM runs GROUP BY da, db, diag, rk
    ),
    role AS (
        SELECT da AS doc_id, db AS partner, sa AS s, span_len FROM spans
        UNION ALL
        SELECT db, da, sa - diag, span_len FROM spans
    ),
    agg AS (
        SELECT doc_id, COUNT(DISTINCT partner) AS n_partners,
               COUNT(*) AS n_spans, MAX(span_len) AS max_span
        FROM role GROUP BY doc_id
    ),
    iv AS (
        -- DISTINCT is load-bearing: identical intervals from two
        -- partners would tie on (s, e), and the fresh/gid windows are
        -- evaluated independently — each may order tied rows
        -- differently, splitting one island in two. After DISTINCT,
        -- (s, e) is a total order per doc.
        SELECT DISTINCT doc_id, s, s + span_len - 1 AS e FROM role
        WHERE span_len >= {_ESD_TRIM}
    ),
    isl AS (
        SELECT doc_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS fresh
        FROM iv
    ),
    isl2 AS (
        SELECT doc_id, s, e,
               SUM(fresh) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl
    ),
    cov AS (
        SELECT doc_id, SUM(mx - mn + 1) AS cut FROM (
            SELECT doc_id, gid, MIN(s) AS mn, MAX(e) AS mx
            FROM isl2 GROUP BY doc_id, gid)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(agg.n_partners, 0) AS BIGINT) AS n_partners,
           CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(agg.max_span, 0) AS BIGINT) AS max_span_tokens,
           CAST(COALESCE(cov.cut, 0) AS BIGINT) AS cut_tokens,
           CAST(len(t.ts) - COALESCE(cov.cut, 0) AS BIGINT) AS kept_tokens
    FROM t
    LEFT JOIN agg ON t.doc_id = agg.doc_id
    LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
    # r14 (VERDICT r13 #2): the heaviest p11 plan joins the headline bench
    # set so its wall time is tracked round-over-round, not just by slope.
    headline=True,
)
def exact_substring_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-level exact-substring dedup accounting (Lee et al.
    2021 "Deduplicating Training Data Makes Language Models Better" §4,
    ExactSubstr): per document, every MAXIMAL substring shared verbatim
    with another document — longest shared run, span count, partner
    count — and the tokens a >= 50-token trim pass would remove
    (interval union, so overlapping spans are not double-counted).

    Spark-first plan instead of a distributed suffix array: 8-token
    seed shingles join on content; matches chain into maximal runs via
    the gaps-and-islands key pos − row_number per (docA, docB,
    diagonal), so a maximal shared substring of length T becomes one
    group with COUNT = T−7 — exact for every shared substring >= the
    seed size, which covers the 50-token trim threshold with 6×
    headroom. Only (doc_id, pos, seed) rows shuffle, and the seed
    self-join's fan-out is bounded IN THE PLAN by the `_ESD_OCC_CAP`
    per-gram occurrence cap (boilerplate-scale grams belong to the
    doc-level dedup family; the cap window reuses the join's gram-key
    exchange). At 100 TB additionally swap the gram string for its
    poly_hash to shrink the exchange (collision odds documented at
    dup_spans). Within-doc self-repeats are span_dedup's surface
    (`operators/lm.py`); this operator is the cross-doc maximal-match
    complement.
    """
    d = Catalog(spark, sf_dir).documents
    t = (
        _spread(d.select("doc_id", "text"))
        .select("doc_id", tokens("text").alias("ts"))
        .transform(pin, eager=True)
    )
    seeds = (
        t.filter(F.size("ts") >= _ESD_SEED)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (_ESD_SEED - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(
                            F.slice("ts", i, _ESD_SEED), " "
                        ).alias("g"),
                    ),
                )
            ).alias("__s"),
        )
        .select(
            "doc_id",
            F.col("__s.pos").alias("pos"),
            F.col("__s.g").alias("g"),
        )
    )
    # occurrence cap per gram — bounds the self-join fan-out to
    # O(cap²) per gram key (see _ESD_OCC_CAP); the count window shares
    # the join's hashpartitioning(g) exchange.
    wg = Window.partitionBy("g")
    bounded = (
        seeds.withColumn("occ", F.count(F.lit(1)).over(wg))
        .filter(F.col("occ") <= _ESD_OCC_CAP)
        .drop("occ")
    )
    a, b = bounded.alias("a"), bounded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    wrun = Window.partitionBy("da", "db", "diag").orderBy("pa")
    # Pinned: ``role`` below unions two projections of spans, and both
    # ``agg`` and ``iv`` consume role — four evaluations of the whole
    # seed-explode + cap-window + self-join + run-window pipeline without
    # the pin (r14-opt plan audit: 17 Exchanges → 7, the heaviest
    # headline plan). Lazy, per the multi-consumer convention.
    spans = (
        pairs.withColumn(
            "rk", F.col("pa") - F.row_number().over(wrun)
        )
        .groupBy("da", "db", "diag", "rk")
        .agg(
            F.min("pa").alias("sa"),
            (F.count(F.lit(1)) + (_ESD_SEED - 1)).alias("span_len"),
        )
        .transform(pin)
    )
    role = spans.select(
        F.col("da").alias("doc_id"),
        F.col("db").alias("partner"),
        F.col("sa").alias("s"),
        "span_len",
    ).unionByName(
        spans.select(
            F.col("db").alias("doc_id"),
            F.col("da").alias("partner"),
            (F.col("sa") - F.col("diag")).alias("s"),
            "span_len",
        )
    )
    agg = role.groupBy("doc_id").agg(
        F.count_distinct("partner").alias("n_partners"),
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").alias("max_span"),
    )
    # distinct is load-bearing: identical intervals from two partners
    # tie on (s, e) and the two window passes below may order tied rows
    # differently (observed: one island double-counted at sf0.01);
    # after distinct, (s, e) is a total order per doc.
    iv = (
        role.filter(F.col("span_len") >= _ESD_TRIM)
        .select(
            "doc_id",
            "s",
            (F.col("s") + F.col("span_len") - 1).alias("e"),
        )
        .distinct()
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fresh = F.when(
        F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
    ).otherwise(0)
    cov = (
        iv.withColumn("fresh", fresh)
        .withColumn("gid", F.sum("fresh").over(wcum))
        .groupBy("doc_id", "gid")
        .agg(F.min("s").alias("mn"), F.max("e").alias("mx"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("mx") - F.col("mn") + 1).alias("cut"))
    )
    z = F.lit(0)
    return (
        t.select("doc_id", F.size("ts").alias("nt"))
        .join(agg, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nt").cast("long").alias("n_tokens"),
            F.coalesce("n_partners", z).cast("long").alias("n_partners"),
            F.coalesce("n_spans", z).cast("long").alias("n_spans"),
            F.coalesce("max_span", z).cast("long").alias(
                "max_span_tokens"
            ),
            F.coalesce("cut", z).cast("long").alias("cut_tokens"),
            (F.col("nt") - F.coalesce("cut", z))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


@register(
    "quality_calibration_curve_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    r AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(
                          list_transform(toks, t -> {_SQL_QW}),
                          (a, b) -> a + b)
                 END AS raw
          FROM t),
    p AS (SELECT doc_id,
                 ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0))
                       AS DECIMAL(28,12)), 4)::DOUBLE AS prob,
                 CASE WHEN len(toks) >= 40
                       AND 10 * len(list_distinct(toks)) >= 4 * len(toks)
                      THEN 1 ELSE 0 END AS gold
          FROM r)
    SELECT LEAST(CAST(floor(prob * 10) AS INT), 9) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(prob AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS mean_prob,
           CAST(SUM(gold) AS DOUBLE) / COUNT(*) AS gold_rate,
           ABS(CAST(SUM(CAST(prob AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*)
               - CAST(SUM(gold) AS DOUBLE) / COUNT(*)) AS abs_gap
    FROM p GROUP BY bucket
    """,
)
def quality_calibration_curve_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram for the curation-score classifier: per score
    decile, the observed rate of an INDEPENDENT rule-based gold label
    (Gopher-style: >= 40 words and unique-token fraction >= 0.4) vs the
    classifier's mean probability — the calibration check a pipeline
    runs before trusting `linear_quality_score` thresholds (the existing
    `quality_calibration_q` tabulates bucket sizes only; this measures
    whether the scores MEAN anything). Per rule 16 the two rates ship as
    raw doubles — each is a double division of a decimal-exact sum by a
    count, bit-identical across engines; no re-round that could create a
    half-boundary tie. One codegen'd scan + a 10-key groupBy with
    map-side combine: flat at any corpus size.
    """
    d = Catalog(spark, sf_dir).documents
    toks = tokens(F.col("text"))
    gold = F.when(
        (F.size(toks) >= 40)
        & (10 * F.size(F.array_distinct(toks)) >= 4 * F.size(toks)),
        1,
    ).otherwise(0)
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    p = d.select(prob.alias("prob"), gold.alias("gold"))
    cnt = F.count(F.lit(1))
    mean_prob = (
        F.sum(F.col("prob").cast("decimal(18,4)")).cast("double") / cnt
    )
    gold_rate = F.sum("gold").cast("double") / cnt
    return (
        p.groupBy(
            F.least(
                F.floor(F.col("prob") * 10).cast("int"), F.lit(9)
            ).alias("bucket")
        )
        .agg(
            cnt.cast("long").alias("n_docs"),
            mean_prob.alias("mean_prob"),
            gold_rate.alias("gold_rate"),
            F.abs(mean_prob - gold_rate).alias("abs_gap"),
        )
    )


@register(
    "seq_packing_q",
    f"""
    WITH t AS (SELECT doc_id, len({_SQL_TOKENS}) AS n FROM documents),
    c AS (SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
          FROM t),
    d AS (SELECT doc_id, n, cum - n AS s, cum AS e FROM c WHERE n > 0),
    x AS (SELECT doc_id, n, s, e,
                 CAST(s // {_PACK_LEN} AS BIGINT) AS s0,
                 CAST((e - 1) // {_PACK_LEN} AS BIGINT) AS s1
          FROM d),
    ex AS (SELECT doc_id, s, e, u.q AS seq_id
           FROM x, UNNEST(range(s0, s1 + 1)) u(q))
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s >= seq_id * {_PACK_LEN}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           CAST(SUM(LEAST(e, (seq_id + 1) * {_PACK_LEN})
                    - GREATEST(s, seq_id * {_PACK_LEN})) AS BIGINT)
               AS fill_tokens,
           CAST({_PACK_LEN} - SUM(LEAST(e, (seq_id + 1) * {_PACK_LEN})
                    - GREATEST(s, seq_id * {_PACK_LEN})) AS BIGINT)
               AS pad_tokens
    FROM ex GROUP BY seq_id
    """,
)
def seq_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-chunk sequence packing accounting:
    documents concatenated in doc_id order and split every 128 tokens;
    per training sequence, how many documents overlap it, how many
    START in it, and its fill/padding — the packing-efficiency and
    document-boundary-fragmentation read a pretraining loader needs
    (only the final sequence can pad; every other row's pad_tokens = 0
    is a built-in self-check).

    Scale shape: token offsets come from the `global_cumsum` primitive
    (ONE repartitionByRange pass + broadcast partition offsets — no
    single-partition window), the per-doc explode emits exactly
    (crossings + 1) rows per doc (bounded by n/L + 1), and the
    sequence-keyed aggregation map-side combines. DuckDB replays the
    same arithmetic with a window cumsum.
    """
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n")
    )
    c = global_cumsum(t, ["doc_id"], "n", "cum")
    L = _PACK_LEN
    x = (
        c.filter(F.col("n") > 0)
        .select(
            "doc_id",
            (F.col("cum") - F.col("n")).alias("s"),
            F.col("cum").alias("e"),
        )
        .select(
            "doc_id",
            "s",
            "e",
            F.expr(f"s div {L}").alias("s0"),
            F.expr(f"(e - 1) div {L}").alias("s1"),
        )
    )
    ex = x.select(
        "s", "e", F.explode(F.sequence("s0", "s1")).alias("seq_id")
    )
    fill = F.sum(
        F.least(F.col("e"), (F.col("seq_id") + 1) * L)
        - F.greatest(F.col("s"), F.col("seq_id") * L)
    )
    return ex.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("s") >= F.col("seq_id") * L, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_starts"),
        fill.cast("long").alias("fill_tokens"),
        (F.lit(L) - fill).cast("long").alias("pad_tokens"),
    )


@register(
    "embedding_decontam_q",
    f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               {_SQL_POLY.format(s="'dec:' || vec_id::VARCHAR")} AS h
        FROM embeddings
    ),
    q AS (SELECT vec_id, v FROM e ORDER BY h, vec_id LIMIT {_DECON_K}),
    tr AS (SELECT vec_id, label, v FROM e
           WHERE vec_id NOT IN (SELECT vec_id FROM q)),
    sc AS (
        -- NULLIF on the norm product: a zero vector has no direction,
        -- so its cosine is NULL (not a divide-by-zero error under
        -- Spark ANSI); NULLS LAST is spelled explicitly because the
        -- engines' DESC defaults differ (Spark last, DuckDB first).
        SELECT tr.vec_id, tr.label, q.vec_id AS test_id,
               ROUND(CAST(
                   list_reduce(list_transform(range(1, len(tr.v) + 1),
                       i -> tr.v[i] * q.v[i]), (a, b) -> a + b)
                   / NULLIF(
                      sqrt(list_reduce(list_transform(tr.v, x -> x * x),
                           (a, b) -> a + b))
                      * sqrt(list_reduce(list_transform(q.v, x -> x * x),
                             (a, b) -> a + b)), 0.0)
                   AS DECIMAL(28,12)), 6)::DOUBLE AS cos
        FROM tr, q
    ),
    best AS (
        SELECT vec_id, label, test_id, cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC NULLS LAST, test_id) AS rn
        FROM sc
    )
    SELECT vec_id, label,
           test_id AS nn_test_id,
           cos AS max_cos,
           COALESCE(cos >= {_DECON_TAU}, FALSE) AS contaminated
    FROM best WHERE rn = 1
    """,
)
def embedding_decontam_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level train/test decontamination (the semantic
    complement of `token_ngram_decontam_q`): a FIXED-SIZE content-keyed
    eval suite (the 32 smallest-hash vectors — benchmark size does not
    grow with the training corpus), then every TRAIN vector's nearest
    suite vector by cosine — flagged when similarity >= 0.40, i.e. the
    training rows a leakage audit would quarantine before pretraining.

    Scale shape: the broadcast side is the CONSTANT-SIZE test suite
    (TakeOrdered top-32 by content hash, additionally behind the same
    loud 100k `_broadcast_guard` as `knn_bruteforce` in case the suite
    parameter is raised); the train side streams through one codegen'd
    scan, so cost is LINEAR in the corpus — unlike a
    proportional-split design, which would be quadratic at any scale
    (corpus-fraction splits belong to `hash_split_q`). Cosines rank on
    the rounded value with test_id tiebreak (the knn_loo convention).
    """
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        poly_hash(
            F.concat(F.lit("dec:"), F.col("vec_id").cast("string"))
        ).alias("h"),
    )
    q = _broadcast_guard(
        e.orderBy("h", "vec_id")
        .limit(_DECON_K)
        .select(F.col("vec_id").alias("test_id"), F.col("v").alias("qv")),
        100_000,
        "embedding_decontam_q",
    )
    tr = e.join(
        q.select(F.col("test_id").alias("vec_id")), "vec_id", "left_anti"
    ).select("vec_id", "label", "v")
    # NULLIF on the norm product: a zero vector has no direction, so its
    # cosine is NULL — not a DIVIDE_BY_ZERO error under ANSI (edge found
    # by the hostile-input probe, pinned in test_p11_edge_guards).
    # nulls-last is spelled explicitly to match the oracle's NULLS LAST.
    guarded_cos = dot(F.col("v"), F.col("qv")) / F.nullif(
        norm(F.col("v")) * norm(F.col("qv")), F.lit(0.0)
    )
    # Round through the repo's decimal(28,12) quantize convention
    # (operators/quality.py, p10.py) so both engines round the same
    # 12-digit quantization — F.round on the raw double HALF_UPs the
    # shortest-repr decimal and can flip a rounding tie vs the oracle's
    # DECIMAL(28,12) double-round (ADVICE r12 medium).
    sc = tr.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        "test_id",
        F.round(guarded_cos.cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc_nulls_last(), F.col("test_id")
    )
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("test_id").alias("nn_test_id"),
            F.col("cos").alias("max_cos"),
            F.coalesce(
                F.col("cos") >= _DECON_TAU, F.lit(False)
            ).alias("contaminated"),
        )
    )


# Exact-substring decontamination: fixed-size held-out suite (benchmark
# docs do not grow with the corpus) and the flag threshold — any
# verbatim train↔test overlap this long is leakage.
_ESDC_K = 25
_ESDC_FLAG = 40


@register(
    "exact_substring_decontam_q",
    f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKENS} AS ts,
               {_SQL_POLY.format(s="'esd:' || doc_id::VARCHAR")} AS h
        FROM documents
    ),
    suite AS (SELECT doc_id FROM t ORDER BY h, doc_id LIMIT {_ESDC_K}),
    seeds AS (
        SELECT doc_id, u.i AS pos,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 2}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED}
    ),
    m AS (
        SELECT a.doc_id AS td, b.doc_id AS dd, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM seeds a JOIN seeds b ON a.g = b.g
        WHERE a.doc_id IN (SELECT doc_id FROM suite)
          AND b.doc_id NOT IN (SELECT doc_id FROM suite)
    ),
    spans AS (
        SELECT td, dd, diag, COUNT(*) + {_ESD_SEED - 1} AS sl
        FROM (SELECT td, dd, diag, pa,
                     pa - ROW_NUMBER() OVER (
                         PARTITION BY td, dd, diag ORDER BY pa) AS rk
              FROM m)
        GROUP BY td, dd, diag, rk
    ),
    agg AS (
        SELECT td, COUNT(DISTINCT dd) AS n_partners, COUNT(*) AS n_spans,
               MAX(sl) AS mx
        FROM spans GROUP BY td
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(agg.n_partners, 0) AS BIGINT)
               AS n_train_partners,
           CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(agg.mx, 0) AS BIGINT) AS max_overlap_tokens,
           COALESCE(agg.mx, 0) >= {_ESDC_FLAG} AS contaminated
    FROM suite JOIN t ON suite.doc_id = t.doc_id
    LEFT JOIN agg ON t.doc_id = agg.td
    """,
)
def exact_substring_decontam_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train→test exact-substring decontamination (Lee et al. 2021 §6.2:
    verbatim train/eval overlap inflates benchmark scores): for each doc
    of a FIXED 25-doc held-out suite (smallest content hash), the
    longest substring shared verbatim with ANY training doc, partner and
    span counts, and a leakage flag at 40 tokens — the maximal-match
    strengthening of the 13-gram-level `token_ngram_decontam_q`.

    Scale shape: the suite's seed set is contamination-suite-sized and
    BROADCASTS — the corpus-side seed stream joins against it with no
    shuffle of corpus data at all (the run/span windows see matched
    pairs only). Same seed-chain exactness argument as
    `exact_substring_dedup_q`: every shared substring >= the 8-token
    seed appears as one maximal diagonal run, so the 40-token flag has
    5x headroom.
    """
    d = Catalog(spark, sf_dir).documents
    t = (
        _spread(d.select("doc_id", "text"))
        .select(
            "doc_id",
            tokens("text").alias("ts"),
            poly_hash(
                F.concat(F.lit("esd:"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
        .transform(pin, eager=True)
    )
    suite = t.orderBy("h", "doc_id").limit(_ESDC_K).select("doc_id")
    seeds = (
        t.filter(F.size("ts") >= _ESD_SEED)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (_ESD_SEED - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(
                            F.slice("ts", i, _ESD_SEED), " "
                        ).alias("g"),
                    ),
                )
            ).alias("__s"),
        )
        .select(
            "doc_id",
            F.col("__s.pos").alias("pos"),
            F.col("__s.g").alias("g"),
        )
    )
    test_seeds = seeds.join(F.broadcast(suite), "doc_id").select(
        F.col("doc_id").alias("td"), F.col("pos").alias("pa"), "g"
    )
    train_seeds = seeds.join(F.broadcast(suite), "doc_id", "left_anti")
    m = train_seeds.join(F.broadcast(test_seeds), "g").select(
        "td",
        F.col("doc_id").alias("dd"),
        "pa",
        (F.col("pa") - F.col("pos")).alias("diag"),
    )
    wrun = Window.partitionBy("td", "dd", "diag").orderBy("pa")
    spans = (
        m.withColumn("rk", F.col("pa") - F.row_number().over(wrun))
        .groupBy("td", "dd", "diag", "rk")
        .agg((F.count(F.lit(1)) + (_ESD_SEED - 1)).alias("sl"))
    )
    agg = spans.groupBy("td").agg(
        F.count_distinct("dd").alias("n_partners"),
        F.count(F.lit(1)).alias("n_spans"),
        F.max("sl").alias("mx"),
    )
    z = F.lit(0)
    return (
        suite.join(t, "doc_id")
        .join(agg, t.doc_id == F.col("td"), "left")
        .select(
            "doc_id",
            F.size("ts").cast("long").alias("n_tokens"),
            F.coalesce("n_partners", z)
            .cast("long")
            .alias("n_train_partners"),
            F.coalesce("n_spans", z).cast("long").alias("n_spans"),
            F.coalesce("mx", z).cast("long").alias("max_overlap_tokens"),
            (F.coalesce("mx", z) >= _ESDC_FLAG).alias("contaminated"),
        )
    )


# Threshold grid for the keep-threshold operating characteristic
# (integer bin keys per DETERMINISM rule 3).
_QTS_TAUS = list(range(1, 10))


def _qts_case_sql() -> str:
    cols = []
    for tau in _QTS_TAUS:
        t = f"0.{tau}"
        cols.append(
            f"SUM(CASE WHEN prob >= {t} THEN 1 ELSE 0 END) AS k{tau},"
            f" SUM(CASE WHEN prob >= {t} AND gold = 1 THEN 1 ELSE 0 END)"
            f" AS g{tau}"
        )
    return ", ".join(cols)


@register(
    "quality_threshold_sweep_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    r AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(
                          list_transform(toks, t -> {_SQL_QW}),
                          (a, b) -> a + b)
                 END AS raw
          FROM t),
    p AS (SELECT ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0))
                       AS DECIMAL(28,12)), 4)::DOUBLE AS prob,
                 CASE WHEN len(toks) >= 40
                       AND 10 * len(list_distinct(toks)) >= 4 * len(toks)
                      THEN 1 ELSE 0 END AS gold
          FROM r),
    agg AS (SELECT COUNT(*) AS n_total, SUM(gold) AS n_gold,
                   {_qts_case_sql()}
            FROM p)
    """
    + "\nUNION ALL\n".join(
        f"""SELECT {tau} AS tau_x10,
           CAST(k{tau} AS BIGINT) AS n_keep,
           CAST(k{tau} AS DOUBLE) / n_total AS keep_rate,
           CAST(g{tau} AS DOUBLE) / NULLIF(k{tau}, 0) AS precision_gold,
           CAST(g{tau} AS DOUBLE) / NULLIF(n_gold, 0) AS recall_gold
    FROM agg"""
        for tau in _QTS_TAUS
    ),
)
def quality_threshold_sweep_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Operating characteristic for the curation keep-threshold: at each
    cut 0.1..0.9 over `linear_quality_score`, the kept fraction of the
    corpus and the precision/recall against the same independent
    rule-based gold as `quality_calibration_curve_q` — the table that
    turns "the scores are calibrated" into "cut at 0.6". The whole grid
    comes from ONE conditional aggregate over one scan (the
    truncation_loss_q shape: adding a threshold adds a column, not a
    pass), then the single agg row explodes to 9 rows — metadata-scale,
    no re-aggregation, flat at any corpus size. Rates ship as raw
    doubles of exact integer counts (rule 16).
    """
    d = Catalog(spark, sf_dir).documents
    toks = tokens(F.col("text"))
    gold = F.when(
        (F.size(toks) >= 40)
        & (10 * F.size(F.array_distinct(toks)) >= 4 * F.size(toks)),
        1,
    ).otherwise(0)
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    p = d.select(prob.alias("prob"), gold.alias("gold"))
    aggs = [
        F.count(F.lit(1)).alias("n_total"),
        F.sum("gold").alias("n_gold"),
    ]
    for tau in _QTS_TAUS:
        keep = F.col("prob") >= tau / 10.0
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).alias(f"k{tau}"))
        aggs.append(
            F.sum(
                F.when(keep & (F.col("gold") == 1), 1).otherwise(0)
            ).alias(f"g{tau}")
        )
    one = p.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(tau).alias("tau_x10"),
                    F.col(f"k{tau}").alias("k"),
                    F.col(f"g{tau}").alias("g"),
                )
                for tau in _QTS_TAUS
            ]
        )
    )
    return one.select("n_total", "n_gold", rows.alias("r")).select(
        F.col("r.tau_x10").alias("tau_x10"),
        F.col("r.k").cast("long").alias("n_keep"),
        (F.col("r.k").cast("double") / F.col("n_total")).alias(
            "keep_rate"
        ),
        (
            F.col("r.g").cast("double")
            / F.nullif(F.col("r.k"), F.lit(0))
        ).alias("precision_gold"),
        (
            F.col("r.g").cast("double")
            / F.nullif(F.col("n_gold"), F.lit(0))
        ).alias("recall_gold"),
    )


# Data-constrained scaling (Muennighoff et al. 2023 "Scaling
# Data-Constrained Language Models"): repeating deduplicated data for
# R_D extra epochs is worth D' = U * (1 + RSTAR * (1 - exp(-R_D/RSTAR)))
# effective unique tokens (their fitted R_D* ~= 15.4 for data). The
# decay factors are PRECOMPUTED PYTHON LITERALS embedded in both
# engines' plans — a per-row exp() would run each engine's libm
# (DETERMINISM rule 16); a literal grid runs neither.
_DCE_RSTAR = 15.4
_DCE_EPOCHS = list(range(1, 9))
_DCE_DECAY = {
    e: repr(1.0 - __import__("math").exp(-(e - 1) / _DCE_RSTAR))
    for e in _DCE_EPOCHS
}
_DCE_CHUNK = 20


def _dce_grid_sql() -> str:
    # the decay literal goes through a STRING → DOUBLE cast: a bare
    # numeric literal would parse as DECIMAL(38,18) and its
    # decimal→double conversion can land one ulp away from the strtod
    # parse Spark/Python use for the same repr (observed at sf0.1)
    rows = ", ".join(
        f"({e}, '{_DCE_DECAY[e]}'::DOUBLE)" for e in _DCE_EPOCHS
    )
    return f"(VALUES {rows}) AS grid(epochs, decay)"


@register(
    "data_constrained_epochs_q",
    f"""
    WITH t AS (SELECT doc_id, source, {_SQL_TOKENS} AS ts
               FROM documents),
    c AS (
        SELECT doc_id, source, ci,
               list_aggregate(
                   ts[{_DCE_CHUNK}*(ci-1)+1 : {_DCE_CHUNK}*ci],
                   'string_agg', ' ') AS g,
               least({_DCE_CHUNK},
                     len(ts) - {_DCE_CHUNK}*(ci-1)) AS clen
        FROM t, LATERAL (
            SELECT unnest(range(1,
                (len(ts) + {_DCE_CHUNK - 1}) // {_DCE_CHUNK} + 1)) AS ci)
        WHERE len(ts) >= 1
    ),
    own AS (
        SELECT source, clen,
               ROW_NUMBER() OVER (PARTITION BY g
                   ORDER BY doc_id, ci) AS rn
        FROM c
    ),
    u AS (
        SELECT source,
               CAST(SUM(CASE WHEN rn = 1 THEN clen ELSE 0 END)
                    AS BIGINT) AS uniq_tokens
        FROM own GROUP BY source
    )
    SELECT u.source, CAST(grid.epochs AS INT) AS epochs,
           u.uniq_tokens,
           CAST(u.uniq_tokens * grid.epochs AS BIGINT) AS raw_tokens,
           -- every factor is forced to DOUBLE: DuckDB parses the
           -- decay/1.0/{_DCE_RSTAR} literals as DECIMAL and would keep
           -- exact 18-digit arithmetic where Spark computes in double
           u.uniq_tokens * (CAST(1.0 AS DOUBLE)
               + CAST({_DCE_RSTAR} AS DOUBLE) * CAST(grid.decay AS DOUBLE))
               AS effective_tokens,
           u.uniq_tokens * (CAST(1.0 AS DOUBLE)
               + CAST({_DCE_RSTAR} AS DOUBLE) * CAST(grid.decay AS DOUBLE))
               / (u.uniq_tokens * grid.epochs) AS repeat_value
    FROM u, {_dce_grid_sql()}
    """,
)
def data_constrained_epochs_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-constrained epoch planning (Muennighoff et al. 2023): per
    source, the unique-token budget after chunk-level exact dedup
    (20-token chunks, global first-owner — the corpus's real duplicate
    mass, not a modeled one) crossed with the paper's repeated-epoch
    value curve D' = U*(1 + R*(1−e^(−(epochs−1)/R*))), R* = 15.4 — the
    table a budget-constrained pretraining run reads to decide how many
    epochs of repetition still buy effective data.

    Scale shape: ONE gram-key window over (doc, chunk) rows (only
    chunk-gram rows shuffle, the chunk_dedup_q machinery), one 20-key
    aggregation, then a cross join of the metadata-sized per-source
    table with an 8-row LITERAL grid — the exp decay factors are
    Python-precomputed literals, identical doubles in both engines, so
    no per-row libm runs anywhere (rule 16). All downstream doubles are
    raw products/ratios of exact counts and those literals.
    """
    d = Catalog(spark, sf_dir).documents
    t = _spread(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", tokens("text").alias("ts")
    )
    L = _DCE_CHUNK
    c = (
        t.filter(F.size("ts") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.expr(f"(size(ts) + {L - 1}) div {L}").cast("int"),
                )
            ).alias("ci"),
            F.col("ts"),
        )
        .select(
            "doc_id",
            "source",
            "ci",
            F.array_join(
                F.slice("ts", (F.col("ci") - 1) * L + 1, L), " "
            ).alias("g"),
            F.least(
                F.lit(L), F.size("ts") - (F.col("ci") - 1) * L
            ).alias("clen"),
        )
    )
    wg = Window.partitionBy("g").orderBy("doc_id", "ci")
    u = (
        c.withColumn("rn", F.row_number().over(wg))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("rn") == 1, F.col("clen")).otherwise(0))
            .cast("long")
            .alias("uniq_tokens")
        )
    )
    grid = metadata_df(spark,
        [(e, float(_DCE_DECAY[e])) for e in _DCE_EPOCHS],
        "epochs int, decay double",
    )
    eff = F.col("uniq_tokens") * (
        F.lit(1.0) + F.lit(_DCE_RSTAR) * F.col("decay")
    )
    return u.crossJoin(F.broadcast(grid)).select(
        "source",
        F.col("epochs").cast("int").alias("epochs"),
        "uniq_tokens",
        (F.col("uniq_tokens") * F.col("epochs"))
        .cast("long")
        .alias("raw_tokens"),
        eff.alias("effective_tokens"),
        (eff / (F.col("uniq_tokens") * F.col("epochs"))).alias(
            "repeat_value"
        ),
    )

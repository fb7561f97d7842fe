"""Registry chunk 12: round-13 LLM-pipeline batch (10 @register entries).

Extractable-memorization audit over prefix duplication (Carlini et al.
2023, "Quantifying Memorization Across Neural Language Models"),
tokenizer byte-premium parity per language (Petrov et al. 2023,
"Language Model Tokenizers Introduce Unfairness Between Languages"),
multimodal (perceptual-hash) train→suite decontamination joining the
image near-dup machinery to the doc spine, quality-filter agreement
(Gopher × C4 keep decisions with Cohen's kappa), and the suite-side
dirty-token share per eval document (the "contamination percentage"
convention of public LLM eval reports); the second wave adds the
cross-source duplication matrix and per-doc boilerplate fraction;
the third wave adds the sign-bucket ANN variant of LOO accuracy
(knn_loo's documented 100 TB path, made real), per-document
memorization risk, and per-source quality-score PSI drift.
Registration order continues the registry; see queries/__init__.py for
the chunk re-export contract.
"""
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from iniz_exporters_spark.catalog import Catalog
from iniz_exporters_spark.functions.text import poly_hash, tokens
from iniz_exporters_spark.multimodal.binary import image_phash
from iniz_exporters_spark.queries._base import REGISTRY, register
from iniz_exporters_spark.queries.p01 import BPE_ISH, _SQL_POLY, _SQL_TOKENS
from iniz_exporters_spark.queries.p02 import _PHASH_BANDS_CTE, _phash_payload
# importing the modules registers gopher_rules_q / c4_rules_q, whose
# REGISTERED oracles and builders filter_agreement_q composes verbatim
from iniz_exporters_spark.queries.p09 import _GOPHER_STOPS  # noqa: F401
from iniz_exporters_spark.queries.p10 import c4_rule_flags  # noqa: F401
from iniz_exporters_spark.queries.p02 import _SQL_QW
from iniz_exporters_spark.operators.quality import linear_quality_score
from iniz_exporters_spark.queries.p11 import _ESD_SEED, _ESDC_K
from iniz_exporters_spark.session import spread_for_kernel as _spread
from iniz_exporters_spark.pinning import pin

# Extractable-memorization prompt length (tokens). Carlini 2023 measures
# extraction with ~50-token prompts on web-scale corpora; the synthetic
# gate corpus is word salad whose 8-gram duplication tops out at 3
# occurrences, so the prompt is parameterized down to 3 tokens — the
# duplication-level axis then spans 4+ doublings at every gate scale.
# The continuation is the single next token (greedy-decode analogue).
_EM_PREFIX = 3

# Multimodal decontamination: fixed-size image eval suite (content-keyed
# smallest hash — a benchmark's size does not grow with the corpus) and
# the phash Hamming radius that flags a training image as a suite
# near-duplicate. 10/64 bits sits at the ~10-25% quantile of the
# min-Hamming distribution at every gate scale (mixed flags; exact dups
# exist in the corpus, Hamming 0).
_MMD_K = 16
_MMD_HAM = 10


# ---------------------------------------------------------------------------
# 1. Extractable-memorization audit (Carlini 2023)
# ---------------------------------------------------------------------------
@register(
    "extractable_memorization_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    seeds AS (
        SELECT array_to_string(ts[u.i:u.i+{_EM_PREFIX - 1}], ' ') AS g,
               ts[u.i+{_EM_PREFIX}] AS cont
        FROM t, UNNEST(range(1, greatest(len(ts)-{_EM_PREFIX - 1}, 1))) u(i)
        WHERE len(ts) >= {_EM_PREFIX + 1}
    ),
    per AS (
        SELECT g, COUNT(*) AS occ, COUNT(DISTINCT cont) AS nc
        FROM seeds GROUP BY g
    )
    SELECT CAST(length(printf('%b', occ)) - 1 AS INT) AS dup_level,
           CAST(COUNT(*) AS BIGINT) AS n_prefixes,
           CAST(SUM(CASE WHEN nc = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_deterministic,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences,
           CAST(SUM(CASE WHEN nc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS extractable_rate
    FROM per GROUP BY dup_level
    """,
    # r14 (VERDICT r13 #2): headline-tracked — heaviest memorization-audit
    # plan family, previously visible only to the slope radar.
    headline=True,
)
def extractable_memorization_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extractable-memorization audit (Carlini et al. 2023: a sequence
    is extractable when the k-token prompt deterministically continues
    one way in the training data; extraction rate grows log-linearly
    with duplication). Per duplication level (integer log2 of a
    prefix's corpus-wide occurrence count), how many distinct k-token
    prefixes exist and what fraction have a UNIQUE next token — the
    upper bound on what a greedy decode could regurgitate verbatim.
    A high deterministic share at high duplication levels is exactly
    the data a dedup pass must break up before pretraining.

    Scale shape: token explode (linear) → ONE gram-key exchange for the
    (occ, distinct-continuation) aggregate → a ≤64-row duplication-level
    aggregate. The duplication level is computed INTEGER-exactly from
    the binary-representation length (length(bin(occ))-1), never
    floor(log2(x)) — a libm log2 one ulp under an exact power of two
    would shift a bucket boundary between engines (DETERMINISM rule 6
    class). The rate ships as a raw double division of exact integers
    (the calibration-curve convention). At 100 TB swap the gram string
    for its poly_hash to shrink the exchange, as exact_substring_dedup_q
    documents.
    """
    d = Catalog(spark, sf_dir).documents
    t = _spread(d.select("doc_id", "text")).select(
        "doc_id", tokens("text").alias("ts")
    )
    seeds = (
        t.filter(F.size("ts") >= _EM_PREFIX + 1)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - _EM_PREFIX),
                    lambda i: F.struct(
                        F.array_join(
                            F.slice("ts", i, _EM_PREFIX), " "
                        ).alias("g"),
                        F.element_at("ts", i + _EM_PREFIX).alias("cont"),
                    ),
                )
            ).alias("__s")
        )
        .select(F.col("__s.g").alias("g"), F.col("__s.cont").alias("cont"))
    )
    per = seeds.groupBy("g").agg(
        F.count(F.lit(1)).alias("occ"),
        F.count_distinct("cont").alias("nc"),
    )
    det = F.when(F.col("nc") == 1, 1).otherwise(0)
    lvl = (
        F.length(F.conv(F.col("occ").cast("string"), 10, 2)) - 1
    ).cast("int")
    return (
        per.select(lvl.alias("dup_level"), "occ", det.alias("det"))
        .groupBy("dup_level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prefixes"),
            F.sum("det").cast("long").alias("n_deterministic"),
            F.sum("occ").cast("long").alias("n_occurrences"),
            (
                F.sum("det").cast("double") / F.count(F.lit(1))
            ).alias("extractable_rate"),
        )
    )


# ---------------------------------------------------------------------------
# 2. Tokenizer byte-premium parity per language (Petrov 2023)
# ---------------------------------------------------------------------------
@register(
    "tokenizer_parity_q",
    f"""
    WITH d AS (
        SELECT lang,
               len(regexp_extract_all(text, '{BPE_ISH.replace("'", "''")}'))
                   AS bpe,
               octet_length(encode(text)) AS nb
        FROM documents
    ),
    g AS (
        SELECT lang, COUNT(*) AS n_docs, SUM(bpe) AS n_bpe,
               SUM(nb) AS n_bytes
        FROM d GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs, n_bpe, n_bytes,
               SUM(CASE WHEN lang = 'en' THEN n_bpe END) OVER () AS en_bpe,
               SUM(CASE WHEN lang = 'en' THEN n_bytes END) OVER ()
                   AS en_bytes
        FROM g
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           ROUND(CAST(CAST(n_bpe AS DOUBLE) * 1000.0 / n_bytes
                 AS DECIMAL(28,12)), 6)::DOUBLE AS tokens_per_kb,
           ROUND(CAST((CAST(n_bpe AS DOUBLE) / n_bytes)
                      / (CAST(en_bpe AS DOUBLE) / en_bytes)
                 AS DECIMAL(28,12)), 6)::DOUBLE AS premium_vs_en
    FROM w
    """,
)
def tokenizer_parity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer parity audit (Petrov et al. 2023: the same tokenizer
    charges some languages several times more tokens for equivalent
    content — cost, latency, and context-window unfairness). Per
    language: BPE-ish tokens per kilobyte of UTF-8 text and the PREMIUM
    relative to the English rate (>1 = this language pays more tokens
    per byte). Complements `tokenizer_fertility_q`, which measures
    tokens per WORD with no cross-language baseline; bytes are the
    fair denominator across scripts (Petrov §3).

    Scale shape: per-doc token/byte counts are regexp/length work
    inside the scan projection; ONE map-side-combining aggregation on
    lang; the English baseline spreads via an unpartitioned window over
    the per-language aggregate — bounded by the number of languages,
    metadata-scale at any corpus size. Ratios are double divisions of
    exact BIGINTs spelled identically in both engines (premium as a
    ratio of per-language rates, never a cross-multiplied integer
    product, which would overflow int64 at corpus scale); display
    rounding through the decimal(28,12) quantize convention.
    """
    d = Catalog(spark, sf_dir).documents.select(
        "lang",
        F.regexp_count("text", F.lit(BPE_ISH)).alias("bpe"),
        F.octet_length("text").alias("nb"),
    )
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").alias("n_bpe"),
        F.sum("nb").alias("n_bytes"),
    )
    wall = Window.partitionBy()
    en_bpe = F.sum(
        F.when(F.col("lang") == "en", F.col("n_bpe"))
    ).over(wall)
    en_bytes = F.sum(
        F.when(F.col("lang") == "en", F.col("n_bytes"))
    ).over(wall)
    rate = F.col("n_bpe").cast("double") / F.col("n_bytes")
    en_rate = en_bpe.cast("double") / en_bytes
    return g.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_bpe").cast("long").alias("n_bpe_tokens"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round(
            (F.col("n_bpe").cast("double") * 1000.0 / F.col("n_bytes"))
            .cast("decimal(28,12)"),
            6,
        )
        .cast("double")
        .alias("tokens_per_kb"),
        F.round((rate / en_rate).cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("premium_vs_en"),
    )


# ---------------------------------------------------------------------------
# 3. Multimodal (perceptual-hash) train→suite decontamination
# ---------------------------------------------------------------------------
@register(
    "multimodal_decontam_q",
    f"""
    WITH {_PHASH_BANDS_CTE},
    hh AS (
        SELECT doc_id, b0, b1, b2, b3,
               {_SQL_POLY.format(s="'mmd:' || doc_id::VARCHAR")} AS hk
        FROM b
    ),
    suite AS (SELECT * FROM hh ORDER BY hk, doc_id LIMIT {_MMD_K}),
    tr AS (SELECT * FROM hh
           WHERE doc_id NOT IN (SELECT doc_id FROM suite)),
    sc AS (
        SELECT tr.doc_id, suite.doc_id AS sid,
               CAST(bit_count(xor(tr.b0, suite.b0))
                  + bit_count(xor(tr.b1, suite.b1))
                  + bit_count(xor(tr.b2, suite.b2))
                  + bit_count(xor(tr.b3, suite.b3)) AS INT) AS hd
        FROM tr, suite
    ),
    best AS (
        SELECT doc_id, sid, hd,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY hd, sid) AS rn
        FROM sc
    )
    SELECT doc_id, sid AS nn_suite_doc, hd AS hamming,
           hd <= {_MMD_HAM} AS contaminated
    FROM best WHERE rn = 1
    """,
)
def multimodal_decontam_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decontamination: the image-side complement of
    `embedding_decontam_q` / `exact_substring_decontam_q` — public eval
    reports quarantine training images that perceptually match
    benchmark images (near-dups survive text-level dedup when captions
    differ). A FIXED-SIZE content-keyed image suite (the {_MMD_K}
    smallest-hash payloads), then every TRAIN image's nearest suite
    image by 64-bit perceptual-hash Hamming distance; flagged within
    radius {_MMD_HAM}. Joins the `multimodal/binary.py` phash machinery
    to the doc-dedup spine (VERDICT r12 #6c).

    Scale shape: phash is per-row Arrow-kernel work (no shuffle); the
    suite is CONSTANT-SIZE and broadcasts, so the train side streams
    through one pass — linear in the corpus, the embedding_decontam
    pattern. Banded candidate generation (`phash_neardup`) remains the
    scale path if the suite ever grows corpus-proportional. Hamming
    math is integer-exact; the flag compares integers (no float reaches
    a boolean).
    """
    d = Catalog(spark, sf_dir).documents
    ph = image_phash(_phash_payload(d), "payload", "doc_id").select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        poly_hash(
            F.concat(F.lit("mmd:"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    suite = (
        ph.orderBy("hk", "doc_id")
        .limit(_MMD_K)
        .select(
            F.col("doc_id").alias("sid"),
            F.col("b0").alias("s0"),
            F.col("b1").alias("s1"),
            F.col("b2").alias("s2"),
            F.col("b3").alias("s3"),
        )
    )
    tr = ph.join(
        suite.select(F.col("sid").alias("doc_id")), "doc_id", "left_anti"
    )
    hd = (
        F.bit_count(F.col("b0").bitwiseXOR(F.col("s0")))
        + F.bit_count(F.col("b1").bitwiseXOR(F.col("s1")))
        + F.bit_count(F.col("b2").bitwiseXOR(F.col("s2")))
        + F.bit_count(F.col("b3").bitwiseXOR(F.col("s3")))
    ).cast("int")
    sc = tr.crossJoin(F.broadcast(suite)).select(
        "doc_id", "sid", hd.alias("hd")
    )
    w = Window.partitionBy("doc_id").orderBy("hd", "sid")
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("sid").alias("nn_suite_doc"),
            F.col("hd").alias("hamming"),
            (F.col("hd") <= _MMD_HAM).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# 4. Quality-filter agreement: Gopher × C4 keep decisions
# ---------------------------------------------------------------------------
# The oracle composes the two REGISTERED filter oracles verbatim as
# nested CTE bodies — the audit can never drift from the filters it
# audits. p09/p10 are imported above, so both entries exist here.
_SQL_GOPHER_FULL = REGISTRY["gopher_rules_q"].oracle
_SQL_C4_FULL = REGISTRY["c4_rules_q"].oracle


@register(
    "filter_agreement_q",
    f"""
    WITH gf AS ({_SQL_GOPHER_FULL}),
    cf AS ({_SQL_C4_FULL}),
    j AS (
        SELECT gf.doc_id,
               CASE WHEN gf.passes_all THEN 1 ELSE 0 END AS gk,
               cf.doc_kept AS ck
        FROM gf JOIN cf ON gf.doc_id = cf.doc_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(gk * ck) AS bb,
               SUM(gk * (1 - ck)) AS gb,
               SUM((1 - gk) * ck) AS cb,
               SUM((1 - gk) * (1 - ck)) AS nn
        FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(bb AS BIGINT) AS both_keep,
           CAST(gb AS BIGINT) AS only_gopher,
           CAST(cb AS BIGINT) AS only_c4,
           CAST(nn AS BIGINT) AS neither,
           CAST(bb + nn AS DOUBLE) / n AS observed_agreement,
           ROUND(CAST(
               ((CAST(bb + nn AS DOUBLE) / n)
                - ((CAST(bb + gb AS DOUBLE) / n)
                       * (CAST(bb + cb AS DOUBLE) / n)
                   + (CAST(cb + nn AS DOUBLE) / n)
                       * (CAST(gb + nn AS DOUBLE) / n)))
               / NULLIF(1.0
                   - ((CAST(bb + gb AS DOUBLE) / n)
                          * (CAST(bb + cb AS DOUBLE) / n)
                      + (CAST(cb + nn AS DOUBLE) / n)
                          * (CAST(gb + nn AS DOUBLE) / n)), 0.0)
               AS DECIMAL(28,12)), 6)::DOUBLE AS kappa
    FROM m
    """,
)
def filter_agreement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter agreement audit: do the Gopher document rules
    (Rae 2021 §A1.1) and the C4 line rules (Raffel 2020 §2.2) keep the
    same documents? The 2×2 keep-decision matrix plus Cohen's kappa —
    the standard pre-pipeline check before composing or swapping
    filters (public curation ablations, e.g. RefinedWeb/Dolma, report
    exactly this disagreement). Composes the two REGISTERED filter
    queries — Spark side calls their builders, oracle side nests their
    oracle SQL — so the audit cannot drift from what it audits.

    Scale shape: inherits the filters' shapes (Gopher: one token
    explode + doc_id aggregation; C4: zero-shuffle array expressions),
    one doc_id-keyed join, then a single-row conditional aggregate with
    map-side combine. Kappa's expected agreement is computed from
    per-cell RATE products (double divisions of exact counts, spelled
    identically in both engines), never integer cross-products, which
    would overflow int64 at corpus scale; observed_agreement ships as a
    raw double division (calibration convention), kappa through the
    decimal(28,12) quantize.
    """
    gf = REGISTRY["gopher_rules_q"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes_all").cast("int").alias("gk")
    )
    cf = REGISTRY["c4_rules_q"].fn(spark, sf_dir).select(
        "doc_id", F.col("doc_kept").alias("ck")
    )
    j = gf.join(cf, "doc_id")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gk") * F.col("ck")).alias("bb"),
        F.sum(F.col("gk") * (1 - F.col("ck"))).alias("gb"),
        F.sum((1 - F.col("gk")) * F.col("ck")).alias("cb"),
        F.sum((1 - F.col("gk")) * (1 - F.col("ck"))).alias("nn"),
    )
    n = F.col("n")
    po = (F.col("bb") + F.col("nn")).cast("double") / n
    pe = (
        ((F.col("bb") + F.col("gb")).cast("double") / n)
        * ((F.col("bb") + F.col("cb")).cast("double") / n)
    ) + (
        ((F.col("cb") + F.col("nn")).cast("double") / n)
        * ((F.col("gb") + F.col("nn")).cast("double") / n)
    )
    kappa = (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))
    return m.select(
        n.cast("long").alias("n_docs"),
        F.col("bb").cast("long").alias("both_keep"),
        F.col("gb").cast("long").alias("only_gopher"),
        F.col("cb").cast("long").alias("only_c4"),
        F.col("nn").cast("long").alias("neither"),
        po.alias("observed_agreement"),
        F.round(kappa.cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# 5. Suite-side dirty-token share (eval contamination percentage)
# ---------------------------------------------------------------------------
@register(
    "eval_dirty_tokens_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts,
                      {_SQL_POLY.format(s="'esd:' || doc_id::VARCHAR")} AS h
               FROM documents),
    suite AS (SELECT doc_id FROM t ORDER BY h, doc_id LIMIT {_ESDC_K}),
    seeds AS (
        SELECT doc_id, u.i AS pos,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 2}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED}
    ),
    m AS (
        SELECT a.doc_id AS td, a.pos AS pa, b.doc_id AS dd,
               a.pos - b.pos AS diag
        FROM seeds a JOIN seeds b ON a.g = b.g
        WHERE a.doc_id IN (SELECT doc_id FROM suite)
          AND b.doc_id NOT IN (SELECT doc_id FROM suite)
    ),
    spans AS (
        SELECT td, dd, diag, MIN(pa) AS sa, COUNT(*) + {_ESD_SEED - 1} AS sl
        FROM (SELECT td, dd, diag, pa,
                     pa - ROW_NUMBER() OVER (
                         PARTITION BY td, dd, diag ORDER BY pa) AS rk
              FROM m)
        GROUP BY td, dd, diag, rk
    ),
    iv AS (
        -- DISTINCT is load-bearing, as in exact_substring_dedup_q:
        -- after it, (s, e) is a total order per suite doc.
        SELECT DISTINCT td AS doc_id, sa AS s, sa + sl - 1 AS e FROM spans
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
        SELECT doc_id, SUM(mx - mn + 1) AS dirty FROM (
            SELECT doc_id, gid, MIN(s) AS mn, MAX(e) AS mx
            FROM isl2 GROUP BY doc_id, gid)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.dirty, 0) AS BIGINT) AS dirty_tokens,
           CASE WHEN len(t.ts) = 0 THEN 0.0
                ELSE CAST(COALESCE(cov.dirty, 0) AS DOUBLE) / len(t.ts)
           END AS dirty_share,
           10 * COALESCE(cov.dirty, 0) >= len(t.ts)
               AND len(t.ts) > 0 AS heavily_contaminated
    FROM suite JOIN t USING (doc_id)
    LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
)
def eval_dirty_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-document contaminated-token share: the SUITE-side
    complement of `exact_substring_decontam_q` (which reports the
    longest single overlap). For each doc of the SAME fixed 25-doc
    held-out suite, the interval-UNION of every >= 8-token verbatim
    train overlap on the suite doc's own positions — the "percentage of
    dirty tokens" figure public eval cards report, with the >=10% flag
    (compared INTEGER-exactly as 10*dirty >= n_tokens, so no float
    reaches the boolean). Overlapping matches from different training
    partners are not double-counted — that is the entire point of the
    union over the max-merge accounting.

    Scale shape: identical to exact_substring_decontam_q — the suite's
    seed set is contamination-suite-sized and BROADCASTS; the corpus
    seed stream joins against it with no corpus-data shuffle; the
    run/island windows see matched suite positions only (bounded by
    suite size × doc length). The gate corpora flag 2-4 of 25 suite
    docs at every scale (duplicated docs are ~fully dirty, the rest
    clean — the bimodal shape real dup-contamination audits see).
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
        .agg(
            F.min("pa").alias("sa"),
            (F.count(F.lit(1)) + (_ESD_SEED - 1)).alias("sl"),
        )
    )
    iv = spans.select(
        F.col("td").alias("doc_id"),
        F.col("sa").alias("s"),
        (F.col("sa") + F.col("sl") - 1).alias("e"),
    ).distinct()
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
        .agg(F.sum(F.col("mx") - F.col("mn") + 1).alias("dirty"))
    )
    z = F.lit(0)
    nt = F.size("ts")
    dirty = F.coalesce("dirty", z)
    return (
        suite.join(t, "doc_id")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            nt.cast("long").alias("n_tokens"),
            dirty.cast("long").alias("dirty_tokens"),
            F.when(nt == 0, F.lit(0.0))
            .otherwise(dirty.cast("double") / nt)
            .alias("dirty_share"),
            ((10 * dirty >= nt) & (nt > 0)).alias(
                "heavily_contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 6. Cross-source duplication matrix
# ---------------------------------------------------------------------------
# Verbatim-content overlap between source pairs, at the 8-token gram
# level (the public C4/Pile-style dataset-overlap matrices): which
# feeds duplicate into which — the signal that sets dedup priorities
# and mixture weights before training.
@register(
    "cross_source_dup_matrix_q",
    f"""
    WITH t AS (SELECT doc_id, source, {_SQL_TOKENS} AS ts FROM documents),
    seeds AS (
        SELECT DISTINCT source,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 2}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED}
    ),
    tot AS (SELECT source, COUNT(*) AS ng FROM seeds GROUP BY source),
    srcs AS (
        SELECT g, list_sort(list(DISTINCT source)) AS ss FROM seeds
        GROUP BY g
    ),
    pair AS (
        SELECT ss[u.i + 1] AS src_a, ss[v.j + 1] AS src_b,
               COUNT(*) AS shared
        FROM srcs,
             UNNEST(range(0, len(ss))) u(i),
             UNNEST(range(0, len(ss))) v(j)
        WHERE u.i < v.j
        GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(ta.ng AS BIGINT) AS n_grams_a,
           CAST(tb.ng AS BIGINT) AS n_grams_b,
           CAST(shared AS BIGINT) AS n_shared,
           CAST(shared AS DOUBLE) / (ta.ng + tb.ng - shared) AS jaccard,
           CAST(shared AS DOUBLE) / ta.ng AS containment_a,
           CAST(shared AS DOUBLE) / tb.ng AS containment_b
    FROM pair
    JOIN tot ta ON pair.src_a = ta.source
    JOIN tot tb ON pair.src_b = tb.source
    """,
)
def cross_source_dup_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair sharing at
    least one distinct 8-token gram, the shared-gram count, Jaccard, and
    per-side containment — which feeds copy from which (containment_a
    near 1 with small jaccard = source A is mostly mirrored inside B).
    Only pairs with n_shared > 0 are emitted; absent pairs are exact
    zeros by construction.

    Scale shape: distinct (source, gram) pairs aggregate on the gram key
    (ONE corpus-scale exchange, map-side combine); the per-gram source
    set is bounded by the source COUNT (feeds, not docs — tens, not
    billions), so the pair explode fans out <= C(n_sources, 2) per gram
    and the pair aggregate is matrix-sized. Per-source totals broadcast.
    Overlap ratios are double divisions of exact BIGINTs.
    """
    d = Catalog(spark, sf_dir).documents
    t = _spread(d.select("source", "text")).select(
        "source", tokens("text").alias("ts")
    )
    seeds = (
        t.filter(F.size("ts") >= _ESD_SEED)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (_ESD_SEED - 1)),
                    lambda i: F.array_join(
                        F.slice("ts", i, _ESD_SEED), " "
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    tot = seeds.groupBy("source").agg(F.count(F.lit(1)).alias("ng"))
    srcs = seeds.groupBy("g").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    n = F.size("ss")
    pairs = (
        srcs.filter(n >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), n - 1),
                        lambda i: F.transform(
                            F.sequence(F.lit(0), n - 1),
                            lambda j: F.struct(
                                F.element_at("ss", i + 1).alias("src_a"),
                                F.element_at("ss", j + 1).alias("src_b"),
                                (i < j).alias("keep"),
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .filter(F.col("__p.keep"))
        .groupBy(
            F.col("__p.src_a").alias("src_a"),
            F.col("__p.src_b").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ta = tot.select(
        F.col("source").alias("src_a"), F.col("ng").alias("ng_a")
    )
    tb = tot.select(
        F.col("source").alias("src_b"), F.col("ng").alias("ng_b")
    )
    sh = F.col("shared").cast("double")
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("ng_a").cast("long").alias("n_grams_a"),
            F.col("ng_b").cast("long").alias("n_grams_b"),
            F.col("shared").cast("long").alias("n_shared"),
            (sh / (F.col("ng_a") + F.col("ng_b") - F.col("shared"))).alias(
                "jaccard"
            ),
            (sh / F.col("ng_a")).alias("containment_a"),
            (sh / F.col("ng_b")).alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# 7. Boilerplate fraction per document
# ---------------------------------------------------------------------------
# A gram is boilerplate when it recurs across >= _BP_DF distinct
# documents (headers, footers, license blocks, templates — the
# CCNet/RefinedWeb removal target). On the word-salad gate corpus the
# df distribution tops out at 3, so the threshold sits at 2; real
# corpora raise it with corpus size.
_BP_DF = 2


@register(
    "boilerplate_fraction_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    seeds AS (
        SELECT doc_id, u.i AS pos,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 2}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED}
    ),
    bp AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT doc_id) AS df FROM seeds GROUP BY g)
        WHERE df >= {_BP_DF}
    ),
    hit AS (
        SELECT seeds.doc_id, seeds.pos AS s,
               seeds.pos + {_ESD_SEED - 1} AS e
        FROM seeds JOIN bp ON seeds.g = bp.g
    ),
    iv AS (SELECT DISTINCT doc_id, s, e FROM hit),
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
        SELECT doc_id, SUM(mx - mn + 1) AS bp_tok FROM (
            SELECT doc_id, gid, MIN(s) AS mn, MAX(e) AS mx
            FROM isl2 GROUP BY doc_id, gid)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.bp_tok, 0) AS BIGINT) AS boilerplate_tokens,
           CASE WHEN len(t.ts) = 0 THEN 0.0
                ELSE CAST(COALESCE(cov.bp_tok, 0) AS DOUBLE) / len(t.ts)
           END AS boilerplate_share,
           2 * COALESCE(cov.bp_tok, 0) >= len(t.ts)
               AND len(t.ts) > 0 AS mostly_boilerplate
    FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
    # r14 (VERDICT r13 #2): headline-tracked — the shared-gram-exchange +
    # interval-union pattern's heaviest instance.
    headline=True,
)
def boilerplate_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: the share of a doc's token
    positions covered by 8-token grams that recur across >= {_BP_DF}
    distinct documents — the template/header/license mass a
    CCNet/RefinedWeb-style cleaning pass strips before dedup. Interval
    union over overlapping hits (a token inside two boilerplate grams
    counts once); every doc is emitted (rule 11) with the >=50% flag
    compared INTEGER-exactly (2*bp >= n_tokens).

    Scale shape: seed explode is linear; the document-frequency
    aggregate and the hit join both key on the gram and share one
    hashpartitioning(g) exchange (the p11 occurrence-cap pattern); the
    islands/coverage windows run per-doc on hit rows only. At 100 TB
    the df table is vocabulary-scale and the threshold rises with
    corpus size; swap gram strings for poly_hash to shrink the
    exchange, as exact_substring_dedup_q documents.
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
    bp = (
        seeds.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_DF)
        .select("g")
    )
    # Coverage = |union of [pos, pos+7]| per doc, via span_dedup_counts'
    # lag identity instead of the generic islands dance: every interval
    # has ONE length (_ESD_SEED) and (doc_id, pos) is unique in seeds —
    # the bp join keeps at most one row per position — so in pos order an
    # occurrence adds exactly min(_ESD_SEED, pos − lag(pos)) fresh cells
    # (the first adds _ESD_SEED). Integer-identical to the old
    # distinct → running-max-window → island-group → sum pipeline
    # (re-gated vs the unchanged oracle at all three scales), but one lag
    # window + one groupBy on the key the window already partitioned by:
    # the r14-opt plan audit counted 2 Exchanges + 2 window sorts + 4
    # HashAggregates in this leg before, 1 Exchange + 1 window after.
    occ = seeds.join(bp, "g").select("doc_id", "pos")
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    fresh = F.least(
        F.lit(_ESD_SEED), F.col("pos") - F.lag("pos", 1).over(wlag)
    )
    cov = (
        occ.select(
            "doc_id",
            F.coalesce(fresh, F.lit(_ESD_SEED)).alias("__fresh"),
        )
        .groupBy("doc_id")
        .agg(F.sum("__fresh").alias("bp_tok"))
    )
    z = F.lit(0)
    nt = F.size("ts")
    bpt = F.coalesce("bp_tok", z)
    return (
        t.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            nt.cast("long").alias("n_tokens"),
            bpt.cast("long").alias("boilerplate_tokens"),
            F.when(nt == 0, F.lit(0.0))
            .otherwise(bpt.cast("double") / nt)
            .alias("boilerplate_share"),
            ((2 * bpt >= nt) & (nt > 0)).alias("mostly_boilerplate"),
        )
    )


# ---------------------------------------------------------------------------
# 8. LOO 5-NN accuracy over sign-bucket candidates — knn_loo's 100 TB path
# ---------------------------------------------------------------------------
# Adaptive-depth divisor: bits = 4 + integer-log2(n / this), so the
# bucket COUNT scales as 16*n/this and MEAN occupancy stays constant
# (~this/16 = ~31 vectors) at any corpus size — total candidate work
# sum(n_b^2) ~ n * 31 = LINEAR in n. The first
# cut used FIXED bits=4 and measured cross-scale slope 4.08 (bucket
# sizes grow with n, so sum(n_b^2) is still quadratic) — the adaptive
# depth is what makes this the genuine 100 TB path.
_ANN_TARGET_BUCKET = 500


def _ann_bits(n: int) -> int:
    """Adaptive sign-LSH depth: 4 + integer-log2(n / _ANN_TARGET_BUCKET).

    Keeps the MEAN bucket at ~_ANN_TARGET_BUCKET vectors at any corpus
    size, so the per-bucket quadratic term sum(n_b^2) stays ~n * target
    = LINEAR in n. Shared by knn_loo_ann_q and the p13 queries built on
    "the knn_loo_ann_q pattern" (crosslingual_decontam_q,
    crossmodal_hard_negatives_q); their oracles embed _ANN_BITS_SQL,
    the DuckDB twin of this expression — edit both HERE so the three
    query pairs cannot desynchronize.
    """
    return 4 + max(0, (max(n // _ANN_TARGET_BUCKET, 1)).bit_length() - 1)


# DuckDB twin of ``_ann_bits``: the integer log2 comes from the
# binary-repr length (rule 6 corollary), never libm log2. The fragment
# carries the continuation indent of the cfg CTEs that embed it so the
# generated oracle text is unchanged by the hoist.
_ANN_BITS_SQL = f"""4 + GREATEST(0, length(printf('%b',
                   GREATEST(COUNT(*) // {_ANN_TARGET_BUCKET}, 1))) - 1)"""
@register(
    "knn_loo_ann_q",
    f"""
    WITH cfg AS (
        -- adaptive LSH depth: bits grows with the corpus so the MEAN
        -- bucket holds ~{_ANN_TARGET_BUCKET} vectors at any scale; the
        -- integer log2 comes from the binary-repr length (rule 6
        -- corollary), never libm log2
        SELECT {_ANN_BITS_SQL}
               AS bits
        FROM embeddings
    ),
    e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(
                   range(0, (SELECT bits FROM cfg)), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN power(2, d)::BIGINT ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.label AS cand_label,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q JOIN e c
          ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    ),
    votes AS (
        SELECT qid, true_label, cand_label, COUNT(*) AS nv
        FROM scored WHERE rn <= 5
        GROUP BY qid, true_label, cand_label
    ),
    pred AS (
        SELECT qid, true_label, cand_label AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY nv DESC, cand_label) AS pr
        FROM votes
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(ROUND(CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) AS accuracy
    FROM pred WHERE pr = 1
    GROUP BY true_label
    """,
    # r14 (VERDICT r13 #2): headline-tracked — the ANN scale path whose
    # wall time (not just slope) must be watched round-over-round.
    headline=True,
)
def knn_loo_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO 5-NN label accuracy over SIGN-BUCKET candidates — the
    documented 100 TB path of `knn_loo_accuracy_q`, made real: instead
    of broadcasting the whole corpus (quadratic, guard-capped at 20k),
    candidates come from an EQUI-JOIN on the deterministic 4-bit
    sign-bucket (fixed axis-aligned hyperplanes, `operators/similarity
    .sign_bucket` — the same oracle-checkable LSH `ann_bucketed` uses).
    The vote plan is IDENTICAL to the exact query; only candidate
    generation changes, so the accuracy delta between the two IS the
    ANN recall cost, measurable at any scale.

    Scale shape: ONE shuffle on the bucket key; per-bucket work is
    sum(n_b²) instead of n², and the LSH depth ADAPTS to the corpus
    (bits = 4 + integer-log2(n/_ANN_TARGET_BUCKET), computed from the same count
    in both engines) so mean occupancy stays ~31 vectors and total
    candidate work is LINEAR in n — the first cut's fixed bits=4
    measured slope 4.08 before this. No broadcast of corpus data ever
    happens.
    Vectors whose bucket holds no other vector drop out of the
    accuracy denominator by construction (inner candidate join) — at
    the gate scales every bucket is populated, so the denominators
    match the exact query's.
    """
    from iniz_exporters_spark.operators.similarity import (
        bucket_loo_sqdist_pairs,
        sign_bucket,
    )

    base = Catalog(spark, sf_dir).embeddings
    # adaptive LSH depth (driver-side, from the same corpus count the
    # oracle's cfg CTE computes): bits = 4 + integer-log2(n / target),
    # so the mean bucket stays ~_ANN_TARGET_BUCKET vectors and the
    # per-bucket quadratic term sum(n_b^2) stays ~n * target = LINEAR.
    n = base.count()
    bits = _ann_bits(n)
    # r14-opt (guide §4.2 + §2.4): candidate generation moved from the
    # self-equi-join + per-pair interpreted HOF d² fold to the family's
    # per-bucket numpy kernel (the ann_bucketed shape): ONE exchange on
    # the bucket key instead of two join sides of the same pinned frame,
    # and the d² folds run vectorized (sequential over dims, so every
    # emitted double is bit-identical to the HOF fold — F.round below is
    # the same op on the same input). Pair rows never carry vectors.
    e = base.select(
        "vec_id",
        "label",
        F.col("embedding"),
        sign_bucket(F.col("embedding"), bits=bits).alias("bucket"),
    )
    scored = bucket_loo_sqdist_pairs(
        e, "bucket", "vec_id", "label", "embedding", what="knn_loo_ann_q"
    ).withColumn("d2", F.round("d2", 6))
    wnn = Window.partitionBy("qid").orderBy("d2", "cid")
    votes = (
        scored.withColumn("rn", F.row_number().over(wnn))
        .filter(F.col("rn") <= 5)
        .groupBy("qid", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("nv").desc(), F.col("cand_label")
    )
    pred = votes.withColumn("pr", F.row_number().over(wv)).filter(
        F.col("pr") == 1
    )
    hit = F.when(F.col("cand_label") == F.col("true_label"), 1).otherwise(
        0
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# 9. Per-document memorization risk (Carlini 2023, per-example view)
# ---------------------------------------------------------------------------
@register(
    "doc_memorization_risk_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    seeds AS (
        SELECT doc_id,
               array_to_string(ts[u.i:u.i+{_ESD_SEED - 1}], ' ') AS g,
               ts[u.i+{_ESD_SEED}] AS cont
        FROM t, UNNEST(range(1, greatest(len(ts)-{_ESD_SEED - 1}, 1))) u(i)
        WHERE len(ts) >= {_ESD_SEED + 1}
    ),
    per AS (
        SELECT g, COUNT(*) AS occ, COUNT(DISTINCT cont) AS nc
        FROM seeds GROUP BY g
    ),
    d AS (
        SELECT seeds.doc_id, COUNT(*) AS np,
               SUM(CASE WHEN occ >= 2 AND nc = 1 THEN 1 ELSE 0 END) AS nr
        FROM seeds JOIN per ON seeds.g = per.g
        GROUP BY seeds.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(d.np, 0) AS BIGINT) AS n_prompts,
           CAST(COALESCE(d.nr, 0) AS BIGINT) AS n_risky,
           CASE WHEN COALESCE(d.np, 0) = 0 THEN 0.0
                ELSE CAST(d.nr AS DOUBLE) / d.np END AS risk_share,
           5 * COALESCE(d.nr, 0) >= COALESCE(d.np, 0)
               AND COALESCE(d.np, 0) > 0 AS at_risk
    FROM t LEFT JOIN d ON t.doc_id = d.doc_id
    """,
)
def doc_memorization_risk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document memorization risk (the per-example view of
    `extractable_memorization_q`, Carlini 2023's actionable output):
    the share of a document's 8-token prompts that are corpus-
    DUPLICATED (occurrence >= 2) with a DETERMINISTIC next token — the
    documents a dedup/quarantine pass drops first because a greedy
    decode could regurgitate them verbatim. The corpus curve uses
    3-token prompts to populate high duplication levels on the gate
    corpus; the per-doc ranking uses the 8-token (_ESD_SEED) prompt
    length, which keeps the >= 20% flag (compared INTEGER-exactly as
    5*n_risky >= n_prompts) mixed at every gate scale. Every doc is
    emitted (rule 11).

    Scale shape: seed explode is linear; the per-gram statistics
    aggregate and the seeds-back join both key on the gram and share
    one hashpartitioning(g) exchange (the boilerplate_fraction_q
    pattern), then one doc_id aggregate. At 100 TB swap gram strings
    for poly_hash to shrink the exchange.
    """
    d = Catalog(spark, sf_dir).documents
    t = (
        _spread(d.select("doc_id", "text"))
        .select("doc_id", tokens("text").alias("ts"))
        .transform(pin, eager=True)
    )
    seeds = (
        t.filter(F.size("ts") >= _ESD_SEED + 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - _ESD_SEED),
                    lambda i: F.struct(
                        F.array_join(
                            F.slice("ts", i, _ESD_SEED), " "
                        ).alias("g"),
                        F.element_at("ts", i + _ESD_SEED).alias("cont"),
                    ),
                )
            ).alias("__s"),
        )
        .select(
            "doc_id",
            F.col("__s.g").alias("g"),
            F.col("__s.cont").alias("cont"),
        )
    )
    per = seeds.groupBy("g").agg(
        F.count(F.lit(1)).alias("occ"),
        F.count_distinct("cont").alias("nc"),
    )
    risky = F.when((F.col("occ") >= 2) & (F.col("nc") == 1), 1).otherwise(
        0
    )
    dd = (
        seeds.join(per, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(risky).alias("nr"),
        )
    )
    z = F.lit(0)
    np_, nr = F.coalesce("np", z), F.coalesce("nr", z)
    return (
        t.select("doc_id")
        .join(dd, "doc_id", "left")
        .select(
            "doc_id",
            np_.cast("long").alias("n_prompts"),
            nr.cast("long").alias("n_risky"),
            F.when(np_ == 0, F.lit(0.0))
            .otherwise(nr.cast("double") / np_)
            .alias("risk_share"),
            ((5 * nr >= np_) & (np_ > 0)).alias("at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# 10. Quality-score drift per source (Population Stability Index)
# ---------------------------------------------------------------------------
# PSI tiers at the industry-standard cuts (0.1 / 0.25). A boolean flag
# would be constant-false at sf0.1 (PSI shrinks ~1/n with sample size),
# so the operator ships the tier LABEL — truthful at every scale.
_PSI_SQL_PROB = (
    "ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0)) AS DECIMAL(28,12)), 4)"
    "::DOUBLE"
)


@register(
    "quality_psi_drift_q",
    f"""
    WITH t AS (SELECT doc_id, source, {_SQL_TOKENS} AS toks FROM documents),
    r AS (SELECT doc_id, source,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(
                          list_transform(toks, t -> {_SQL_QW}),
                          (a, b) -> a + b)
                 END AS raw
          FROM t),
    p AS (SELECT source,
                 LEAST(CAST(floor({_PSI_SQL_PROB} * 10) AS INT), 9)
                     AS bucket
          FROM r),
    cs AS (SELECT source, bucket, COUNT(*) AS c FROM p
           GROUP BY source, bucket),
    tot AS (SELECT bucket, SUM(c) AS tc FROM cs GROUP BY bucket),
    n AS (SELECT source, SUM(c) AS ns FROM cs GROUP BY source),
    nt AS (SELECT SUM(tc) AS nt FROM tot),
    grid AS (
        SELECT n.source, b.i AS bucket, n.ns, nt.nt,
               COALESCE(cs.c, 0) AS c, COALESCE(tot.tc, 0) AS tc
        FROM n CROSS JOIN (SELECT UNNEST(range(0, 10)) AS i) b
        CROSS JOIN nt
        LEFT JOIN cs ON cs.source = n.source AND cs.bucket = b.i
        LEFT JOIN tot ON tot.bucket = b.i
    ),
    terms AS (
        SELECT source, ns,
               CAST((((c + 0.5) / (ns + 5.0)) - ((tc + 0.5) / (nt + 5.0)))
                    * ln(((c + 0.5) / (ns + 5.0))
                         / ((tc + 0.5) / (nt + 5.0)))
                    AS DECIMAL(28,12)) AS term
        FROM grid
    ),
    psi AS (
        SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(term) AS DECIMAL(28,12)), 6)::DOUBLE AS psi
        FROM terms GROUP BY source
    )
    SELECT source, n_docs, psi,
           CASE WHEN psi >= 0.25 THEN 'shifted'
                WHEN psi >= 0.1 THEN 'moderate'
                ELSE 'stable' END AS tier
    FROM psi
    """,
)
def quality_psi_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the curation-score distribution,
    per source vs the whole corpus — the standard filter-monitoring
    check (PSI >= 0.1 moderate drift, >= 0.25 shifted: this source's
    quality profile no longer matches what the filter thresholds were
    calibrated on). Buckets are the SAME ten score deciles as
    `quality_calibration_curve_q`; counts are Jeffreys-smoothed
    (+0.5 per cell over the FIXED 0..9 grid) so empty deciles stay
    defined without epsilon hacks.

    Determinism: each PSI term is quantized to decimal(28,12) BEFORE
    the sum, so the 10-term addition is order-independent (the
    mahalanobis quantized-term-sum convention); ln agrees through the
    6-dp output rounding (rule 6 — inputs are ratios of exact
    integers+0.5, identical in both engines). Scale shape: one
    codegen'd scan → a (source × 10)-key aggregate with map-side
    combine → metadata-scale grid joins; flat at any corpus size.
    """
    d = Catalog(spark, sf_dir).documents
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    p = d.select(
        "source",
        F.least(F.floor(prob * 10).cast("int"), F.lit(9)).alias("bucket"),
    )
    cs = p.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    tot = cs.groupBy("bucket").agg(F.sum("c").alias("tc"))
    n = cs.groupBy("source").agg(F.sum("c").alias("ns"))
    nt = tot.agg(F.sum("tc").alias("nt"))
    grid_b = F.broadcast(
        cs.sparkSession.range(0, 10).select(
            F.col("id").cast("int").alias("bucket")
        )
    )
    grid = (
        n.crossJoin(grid_b)
        .crossJoin(F.broadcast(nt))
        .join(F.broadcast(cs), ["source", "bucket"], "left")
        .join(F.broadcast(tot), ["bucket"], "left")
        .select(
            "source",
            "ns",
            "nt",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
    )
    ps = (F.col("c") + 0.5) / (F.col("ns") + 5.0)
    qs = (F.col("tc") + 0.5) / (F.col("nt") + 5.0)
    term = ((ps - qs) * F.log(ps / qs)).cast("decimal(28,12)")
    psi = (
        grid.select("source", "ns", term.alias("term"))
        .groupBy("source")
        .agg(
            F.max("ns").cast("long").alias("n_docs"),
            F.round(F.sum("term").cast("decimal(28,12)"), 6)
            .cast("double")
            .alias("psi"),
        )
    )
    return psi.select(
        "source",
        "n_docs",
        "psi",
        F.when(F.col("psi") >= 0.25, "shifted")
        .when(F.col("psi") >= 0.1, "moderate")
        .otherwise("stable")
        .alias("tier"),
    )

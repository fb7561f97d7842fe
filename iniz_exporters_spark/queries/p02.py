"""Registry chunk 2/9: 83 @register entries (posexplode_embeddings .. quality_calibration_q).

Mechanical split of the original queries.py (lines 3672-7276); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.session import metadata_df
from iniz_exporters_spark.operators.similarity import ivf_flat_topk
from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.queries.p01 import _EDGES_ORACLE, _SQL_POLY, _SQL_SHINGLE_SET, _SQL_TOKENS, _derived_edges
from iniz_exporters_spark.pinning import pin



# ---------------------------------------------------------------------------
# POSEXPLODE: array → (row, position, element) unnest with ordinality.
# Narrow generate, no shuffle; the oracle replays it with a correlated
# range() lateral join. Elements cast to double before rounding.
# ---------------------------------------------------------------------------
@register(
    "posexplode_embeddings",
    """
    SELECT vec_id,
           unnest(range(len(embedding))) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS elem
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def posexplode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    # ``+ 0.0`` normalizes IEEE -0.0: a tiny negative element rounds to
    # -0.0 in DuckDB but +0.0 in Spark (one cell at sf0.001 — caught by the
    # registry-wide signed-zero lint, same class as cusum_changepoint_q).
    return (
        e.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "raw"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            (F.round(F.col("raw").cast("double"), 4) + F.lit(0.0)).alias(
                "elem"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Running DISTINCT count over a window: how many distinct event types each
# user has produced up to each point in time. Spark has no
# COUNT(DISTINCT) OVER — the idiomatic equivalent is size(collect_set()
# OVER w), which keeps a per-frame hash set. Default RANGE frame includes
# ts-tied peers on both engines, so ties are deterministic by
# construction. Scale note: state is O(|distinct types|) per key — bounded
# here; for unbounded domains use the approx sketch variant.
# ---------------------------------------------------------------------------
@register(
    "window_distinct_running",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts
           ) AS types_so_far
    FROM events
    WHERE user_id < 100
    """,
)
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.filter(F.col("user_id") < 100).select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias(
            "types_so_far"
        ),
    )


# ---------------------------------------------------------------------------
# Forward fill (gap filling): LAST_VALUE ... IGNORE NULLS over an ordered
# per-key window — the standard repair for sparse sensor/metric streams.
# NULLs are synthesized deterministically ('error' events lose their
# value), then each row carries the most recent non-null reading. One
# exchange + sort per key; running state is O(1). The ts ordering adds
# event_id so rows within a tied timestamp fill identically either side.
# ---------------------------------------------------------------------------
@register(
    "window_fill_forward",
    """
    SELECT event_id, user_id,
           v AS raw_value,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    WHERE user_id < 100
    """,
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.filter(F.col("user_id") < 100)
        .withColumn("raw_value", v)
        .select(
            "event_id",
            "user_id",
            "raw_value",
            F.last("raw_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


# ---------------------------------------------------------------------------
# RANK vs DENSE_RANK tie semantics: both depend only on the ORDER-BY
# *values*, so ties produce identical ranks on any engine with no
# tiebreaker needed; o_orderkey identifies rows. Shares one window spec →
# one exchange + one sort.
# ---------------------------------------------------------------------------
@register(
    "rank_dense_rank",
    """
    SELECT o_orderkey, o_custkey,
           rank() OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


from iniz_exporters_spark.plans.graph import connected_components  # noqa: E402


# ---------------------------------------------------------------------------
# Weakly-connected components (the dedup-clustering primitive: near-dup
# PAIRS → groups → one canonical row each). Min-label propagation over
# pinned undirected edges; one shuffle per round, rounds ≈ graph diameter.
# Demonstrated on the nation–region bipartite graph (nodes = nationkey and
# 1000+regionkey) so the oracle can replay the fixpoint as a recursive CTE
# — components come out as one cluster per region, labeled by its minimum
# nation key.
# ---------------------------------------------------------------------------
@register(
    "connected_components_q",
    """
    WITH RECURSIVE e AS (
        SELECT n_nationkey AS src, 1000 + n_regionkey AS dst FROM nation
    ),
    und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    reach(node, r) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, reach.r FROM reach JOIN und u ON reach.node = u.src
    )
    SELECT node, min(r) AS component FROM reach GROUP BY node
    """,
    headline=True,
)
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    edges = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.lit(1000) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    return connected_components(edges)


# ---------------------------------------------------------------------------
# Array set operations: intersect / union / except between per-row token
# arrays (the primitive under n-gram Jaccard and vocabulary diffing).
# Element order out of set ops is engine-specific, so results are
# canonicalized with array_sort; the arrays are then serialized with
# array_join(';') because the driver's pandas canonicalizer cannot hash
# list cells (the round-5 `err` row) — the set operators under test are
# unchanged, only the output representation is a string. All ops are
# row-local (no shuffle).
# ---------------------------------------------------------------------------
@register(
    "array_set_ops",
    """
    SELECT p_partkey,
           coalesce(array_to_string(
               list_sort(list_distinct(list_intersect(nw, tw))), ';'), '')
               AS common_words,
           coalesce(array_to_string(
               list_sort(list_distinct(list_concat(nw, tw))), ';'), '')
               AS all_words,
           coalesce(array_to_string(
               list_sort(list_distinct(
                   list_filter(nw, x -> NOT list_contains(tw, x)))), ';'), '')
               AS name_only_words,
           len(list_distinct(nw)) AS n_name_words
    FROM (
        SELECT p_partkey,
               string_split(p_name, ' ') AS nw,
               string_split(lower(p_type), ' ') AS tw
        FROM part
    )
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    nw = F.split(F.col("p_name"), " ")
    tw = F.split(F.lower(F.col("p_type")), " ")
    return p.select(
        "p_partkey",
        F.array_join(
            F.array_sort(F.array_intersect(nw, tw)), ";"
        ).alias("common_words"),
        F.array_join(
            F.array_sort(F.array_distinct(F.array_union(nw, tw))), ";"
        ).alias("all_words"),
        F.array_join(
            F.array_sort(F.array_except(nw, tw)), ";"
        ).alias("name_only_words"),
        F.size(F.array_distinct(nw)).cast("long").alias("n_name_words"),
    )


# ---------------------------------------------------------------------------
# Multimodal frame-extraction E2E: documents.text encoded to a binary payload,
# run through the REAL extract_frames mapInPandas kernel (fake codec: 16-byte
# windows, every_n sampling), then aggregated per doc. The oracle replicates
# the frame arithmetic independently in SQL — window count, last sampled
# index, and sampled byte total — so the row-expanding kernel is checked
# end-to-end, not rows-only.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.multimodal.binary import extract_frames  # noqa: E402

_MM_EVERY_N = 4
_MM_FB = 16  # fake-codec frame size in bytes


@register(
    "multimodal_frame_stats",
    f"""
    SELECT doc_id,
           CAST((nf - 1) // {_MM_EVERY_N} + 1 AS BIGINT) AS n_frames,
           CAST(((nf - 1) // {_MM_EVERY_N}) * {_MM_EVERY_N} AS INT) AS max_idx,
           CAST(((nf - 1) // {_MM_EVERY_N}) * {_MM_FB}
                + CASE WHEN ((nf - 1) // {_MM_EVERY_N}) * {_MM_EVERY_N} = nf - 1
                       THEN nb - (nf - 1) * {_MM_FB}
                       ELSE {_MM_FB} END AS BIGINT) AS frame_bytes
    FROM (
        SELECT doc_id,
               octet_length(encode(text)) AS nb,
               (octet_length(encode(text)) + {_MM_FB - 1}) // {_MM_FB} AS nf
        FROM documents
    )
    WHERE nb > 0
    """,
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    fr = extract_frames(media, "payload", "doc_id", every_n=_MM_EVERY_N)
    return fr.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.max("frame_idx").cast("int").alias("max_idx"),
        F.sum(F.octet_length("frame")).cast("long").alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# Image perceptual hash (aHash) + banded near-dup — closes the loop between
# the multimodal surface and the dedup family. The REAL mapInPandas kernel
# runs on documents.text encoded as a binary payload (fake codec: pixel p =
# byte p mod n); the oracle replays every bit decision in SQL via hex-string
# byte extraction, so the whole 64-bit hash is value-checked, not rows-only.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.multimodal.binary import (  # noqa: E402
    image_phash,
    phash_neardup,
)


def _band_sql(col: str, j: int) -> str:
    """16-bit band packer shared by the phash oracle (col=px) and p13's
    audio-fingerprint oracle (col=en): bit k of band j is set when
    64 * <col>[k+1] > total. This defines the band geometry behind
    phash_neardup's pigeonhole-recall contract — edit HERE so the two
    oracles cannot diverge."""
    lo = 16 * j
    return (
        f"CAST(list_sum(list_transform(range({lo}, {lo + 16}), "
        f"k -> CASE WHEN 64 * {col}[k + 1] > total "
        f"THEN 1 << (k - {lo}) ELSE 0 END)) AS INT) AS b{j}"
    )


def _phash_band_sql(j: int) -> str:
    return _band_sql("px", j)


_PHASH_BANDS_CTE = f"""
    e AS (SELECT doc_id, hex(encode('#' || text)) AS h,
                 octet_length(encode('#' || text)) AS n
          FROM documents WHERE octet_length(encode(text)) > 0),
    p AS (SELECT doc_id,
                 list_transform(range(0, 64),
                     q -> ('0x' || substring(h, 2 * (q % n) + 1, 2))::BIGINT
                 ) AS px
          FROM e),
    s AS (SELECT doc_id, px, CAST(list_sum(px) AS BIGINT) AS total FROM p),
    b AS (SELECT doc_id, {_phash_band_sql(0)}, {_phash_band_sql(1)},
                 {_phash_band_sql(2)}, {_phash_band_sql(3)}
          FROM s)
"""


def _phash_payload(d: DataFrame) -> DataFrame:
    """Synthetic image payloads from document text, prefixed with '#'
    (0x23): no PPM/PGM/BMP magic can start with it, so the operator's
    real-codec branch (``decode_image_numpy``) provably never intercepts
    these fake payloads and the oracle's replay of the FAKE pixel path
    stays bit-exact — regardless of what a future testdata regeneration
    puts in ``text``."""
    return d.select(
        "doc_id",
        F.encode(F.concat(F.lit("#"), F.col("text")), "UTF-8").alias(
            "payload"
        ),
    )


@register(
    "image_phash_q",
    f"""
    WITH {_PHASH_BANDS_CTE}
    SELECT doc_id, b0, b1, b2, b3,
           printf('%04x%04x%04x%04x', b0, b1, b2, b3) AS phash
    FROM b
    """,
)
def image_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    return image_phash(media, "payload", "doc_id")


# Canonical selection per near-dup cluster with a QUALITY criterion: the
# full dedup-apply pipeline — perceptual-hash pairs → weakly-connected
# components → keep the LONGEST doc per cluster (most-informative-survivor
# convention; ties break to the lowest id). Composes three oracle-checked
# layers; the oracle replays hashing, banding, components (recursive CTE),
# and the argmax window end-to-end.
@register(
    "canonical_longest_q",
    f"""
    WITH RECURSIVE {_PHASH_BANDS_CTE},
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
    und AS (SELECT id_a AS src, id_b AS dst FROM pp
            UNION ALL SELECT id_b, id_a FROM pp),
    reach(node, r) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, reach.r FROM reach JOIN und u ON reach.node = u.src
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT c.node AS doc_id, c.component, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY c.component
                              ORDER BY d.n_chars DESC, c.node ASC) = 1
               AS is_canonical
    FROM comp c JOIN documents d ON c.node = d.doc_id
    """,
    headline=True,
)
def canonical_longest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.plans.graph import connected_components

    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    pairs = phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")
    comps = connected_components(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
    )
    j = comps.join(
        d.select("doc_id", "n_chars"),
        comps["node"] == F.col("doc_id"),
    ).select("doc_id", "component", "n_chars")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "component",
        "n_chars",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


@register(
    "phash_neardup",
    f"""
    WITH {_PHASH_BANDS_CTE},
    pairs AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.b0 AS a0, x.b1 AS a1, x.b2 AS a2, x.b3 AS a3,
               y.b0 AS c0, y.b1 AS c1, y.b2 AS c2, y.b3 AS c3
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT id_a, id_b,
               CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
                  + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))
                 AS INT) AS hamming
        FROM pairs
    ) WHERE hamming <= 3
    """,
    headline=True,
)
def phash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    return phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")


# ---------------------------------------------------------------------------
# Training-pipeline text breadth: repetition quality signal, vocabulary
# building, and train/test contamination detection.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import tokens as _tokens  # noqa: E402
from iniz_exporters_spark.operators.dedup import (  # noqa: E402
    ngram_overlap_pairs,
)


@register(
    "repetition_ratio",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok)
    SELECT doc_id,
           ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
               AS top_ratio,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM c GROUP BY doc_id
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: share of a doc's tokens taken by its most
    frequent token (near 1.0 = degenerate/boilerplate text). Scale shape:
    explode → two map-side-combining aggregations; token rows carry only
    (doc_id, token), never the document payload."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return c.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ratio"),
        F.sum("c").cast("long").alias("n_tokens"),
    )


@register(
    "vocab_topk",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents)
    SELECT tok, CAST(count(*) AS BIGINT) AS freq
    FROM t GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-20 tokens by frequency with a
    deterministic (freq desc, token asc) tiebreak. Scale shape: partial
    count per partition, one shuffle over distinct tokens (vocabulary-sized,
    not corpus-sized), TakeOrderedAndProject for the top-k."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(F.explode(_tokens("text")).alias("tok"))
    return (
        t.groupBy("tok")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


@register(
    "contamination_overlap",
    f"""
    WITH sh AS (SELECT doc_id, unnest({_SQL_SHINGLE_SET}) AS h
                FROM documents),
    te AS (SELECT doc_id AS test_id, h FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id AS train_id, h FROM sh)
    SELECT train_id, test_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN te USING (h)
    WHERE train_id <> test_id
    GROUP BY train_id, test_id
    HAVING count(*) >= 25
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: every 50th doc plays the benchmark set;
    pairs sharing ≥25 distinct 5-char shingle hashes are flagged. The test
    side broadcasts, so the train corpus is never shuffled on the hash."""
    d = Catalog(spark, sf_dir).documents
    test = d.filter(F.col("doc_id") % 50 == 0)
    return ngram_overlap_pairs(
        d, test, "doc_id", "text", k=5, min_shared=25, broadcast_test=True
    )


# ---------------------------------------------------------------------------
# Iterative training: 2 rounds of Lloyd's k-means, oracle-replayed round by
# round (chained CTEs). Deterministic init (k lowest-id vectors), rounded
# argmin assignment, decimal-space-rounded centroid means — see
# operators/clustering.py for the cross-engine determinism scheme.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import kmeans_lloyd  # noqa: E402

_KM_DIST = (
    "ROUND(list_reduce(list_transform(range(1, len(e.v)+1),"
    " i -> (e.v[i]-c.v[i])*(e.v[i]-c.v[i])), (x,y)->x+y), 6)"
)


@register(
    "kmeans_assignments",
    f"""
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
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    )
    SELECT vec_id, CAST(cid AS INT) AS cluster FROM a1
    """,
)
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=2)


# Built-in linear-regression aggregates (slope/intercept/r2) per group —
# both engines implement the same closed-form moments; decimal-space round
# absorbs summation-order ulps.
@register(
    "regression_per_group",
    """
    SELECT n_nationkey AS nation,
           ROUND(CAST(regr_slope(c_acctbal, c_custkey)
                      AS DECIMAL(28,8)), 4)::DOUBLE AS slope,
           ROUND(CAST(regr_intercept(c_acctbal, c_custkey)
                      AS DECIMAL(28,8)), 4)::DOUBLE AS intercept,
           CAST(regr_count(c_acctbal, c_custkey) AS BIGINT) AS n
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_nationkey
    """,
)
def regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    j = cat.customer.join(
        F.broadcast(cat.nation),
        F.col("n_nationkey") == F.col("c_nationkey"),
    )
    return j.groupBy(F.col("n_nationkey").alias("nation")).agg(
        F.round(
            F.expr("regr_slope(c_acctbal, c_custkey)").cast("decimal(28,8)"), 4
        )
        .cast("double")
        .alias("slope"),
        F.round(
            F.expr("regr_intercept(c_acctbal, c_custkey)").cast(
                "decimal(28,8)"
            ),
            4,
        )
        .cast("double")
        .alias("intercept"),
        F.expr("regr_count(c_acctbal, c_custkey)").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# RAG-style token chunking: overlapping 32-token windows every 24 tokens.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import chunk_tokens  # noqa: E402


@register(
    "chunk_tokens_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks) - 8, 1) + 1, 24)) AS st
          FROM t)
    SELECT doc_id,
           CAST((st - 1) // 24 AS INT) AS chunk_idx,
           array_to_string(toks[st : st + 31], ' ') AS chunk,
           CAST(greatest(least(st + 31, len(toks)) - st + 1, 0) AS INT)
               AS n_chunk_tokens
    FROM s
    """,
)
def chunk_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return chunk_tokens(d, "doc_id", "text", size=32, overlap=8)


# ---------------------------------------------------------------------------
# SCD2 interval build: changelog events → per-user validity ranges (the
# warehouse-side "snapshot from changelog" op; the open interval is the
# current state). One shuffle on the partition key, one sort.
# ---------------------------------------------------------------------------
@register(
    "scd2_intervals",
    """
    SELECT user_id, event_id,
           event_type AS state,
           ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS effective_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM events
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM scoring: train token frequencies over the corpus itself, then
# score each doc by average negative log-probability (the poor man's
# perplexity filter — high score = tokens rare in the corpus). Scale shape:
# one explode pass feeds both the vocabulary count (vocab-sized shuffle,
# map-side combined) and the scoring join; the vocab and the scalar total
# broadcast, so the token stream is never shuffled for the join; per-doc
# aggregation is the only corpus-sized exchange.
# ---------------------------------------------------------------------------
@register(
    "unigram_logprob",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    total AS (SELECT sum(c)::DOUBLE AS n FROM freq)
    SELECT doc_id,
           ROUND(CAST(avg(-ln(c / n)) AS DECIMAL(28,12)), 6)::DOUBLE
               AS avg_neg_logp,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM t JOIN freq USING (tok) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    # materialize the vocab ONCE (it feeds both the broadcast join and the
    # scalar total — without pinning, the corpus-wide count runs twice)
    freq = t.groupBy("tok").agg(F.count("*").alias("c")).transform(pin, eager=True)
    total = freq.agg(F.sum("c").cast("double").alias("n"))
    scored = t.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.round(
            F.avg(-F.log(F.col("c") / F.col("n"))).cast("decimal(28,12)"), 6
        )
        .cast("double")
        .alias("avg_neg_logp"),
        F.count("*").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Funnel / sequence analysis: per-user ordered event stream matched against
# the view → click → purchase subsequence. One shuffle (groupBy user); the
# per-user ordered sequence is a bounded collect (events-per-user scale) —
# for power-law users, switch to the two-pass min-timestamp-per-step form.
# ---------------------------------------------------------------------------
@register(
    "funnel_stages",
    """
    WITH s AS (
        SELECT user_id,
               array_to_string(list(event_type ORDER BY ts, event_id), '>')
                   AS seq,
               count(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 3
                WHEN regexp_matches(seq, 'view.*click') THEN 2
                WHEN regexp_matches(seq, 'view') THEN 1
                ELSE 0 END AS funnel_stage,
           CAST(n_events AS BIGINT) AS n_events
    FROM s
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    seq = F.array_join(
        F.transform(ordered, lambda x: x["event_type"]), ">"
    )
    agg = e.groupBy("user_id").agg(
        seq.alias("seq"), F.count("*").cast("long").alias("n_events")
    )
    stage = (
        F.when(F.col("seq").rlike("view.*click.*purchase"), 3)
        .when(F.col("seq").rlike("view.*click"), 2)
        .when(F.col("seq").rlike("view"), 1)
        .otherwise(0)
    )
    return agg.select(
        "user_id", stage.cast("int").alias("funnel_stage"), "n_events"
    )


# ---------------------------------------------------------------------------
# IVF multi-probe: each query searches its 2 nearest cells (recall lever
# near cell boundaries); oracle replays rank-2 probes + cross-cell re-rank.
# ---------------------------------------------------------------------------
@register(
    "ivf_multiprobe_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    ranked AS (
        SELECT e.vec_id, e.v, c.cidx,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                            DESC, c.cidx
               ) AS rnk
        FROM e CROSS JOIN cents c
    ),
    member AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk = 1),
    probes AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk <= 2),
    cell_topk AS (
        SELECT query_id, neighbor_id, cos FROM (
            SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(p.v, m.v), 4) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id, p.cell
                       ORDER BY ROUND(list_cosine_similarity(p.v, m.v), 4)
                                DESC, m.vec_id
                   ) AS crn
            FROM probes p JOIN member m
              ON m.cell = p.cell AND m.vec_id <> p.vec_id
        ) t WHERE crn <= 3
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM cell_topk
    ) t WHERE rn <= 3
    """,
)
def ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ivf_flat_topk(e, n_centroids=8, top_k=3, nprobe=2)


# ---------------------------------------------------------------------------
# Training-mixture control: per-language deterministic sampling rates
# (en 100%, de 50%, es 25%, fr 10%, everything else 5%).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import mixture_sample  # noqa: E402

_MIX_RATES = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.1}


@register(
    "mixture_sample_q",
    f"""
    WITH kept AS (
        SELECT lang, doc_id, n_chars
        FROM documents
        WHERE {_SQL_POLY.format(s="doc_id::VARCHAR")} % 10000 <
              CASE lang WHEN 'de' THEN 5000 WHEN 'en' THEN 10000
                        WHEN 'es' THEN 2500 WHEN 'fr' THEN 1000
                        ELSE 500 END
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang
    """,
)
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    kept = mixture_sample(
        d, "lang", "doc_id", _MIX_RATES, default_rate=0.05
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Retrieval / term-weighting family (operators/ranking.py): TF-IDF top
# terms, BM25 scoring, posting-list build, token PMI. Token rows carry only
# (doc_id, tok); vocab-sized frames broadcast; one corpus-sized shuffle each.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.ranking import (  # noqa: E402
    bm25_scores,
    inverted_index,
    tfidf_top_terms,
    token_pmi,
)

_SQL_TOK_ROWS = f"SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents"


@register(
    "tfidf_top_terms",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf),
    s AS (SELECT doc_id, tok,
                 ROUND(CAST(tf * ln(n_docs / df) AS DECIMAL(28,12)), 6)::DOUBLE
                     AS tfidf
          FROM tf JOIN df USING (tok) CROSS JOIN n)
    SELECT doc_id, tok, CAST(rn AS INT) AS term_rank, tfidf
    FROM (SELECT doc_id, tok, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, tok) AS rn
          FROM s)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return tfidf_top_terms(d, "doc_id", "text", top_n=3)


_BM25_TERMS = ("hash", "join", "filter")


@register(
    "bm25_score",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ('hash', 'join', 'filter') GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok)
    SELECT doc_id,
           ROUND(SUM(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
               AS DECIMAL(28,12))), 6)::DOUBLE AS bm25,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
    CROSS JOIN a CROSS JOIN n
    GROUP BY doc_id
    """,
)
def bm25_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return bm25_scores(d, list(_BM25_TERMS), "doc_id", "text", k1=1.2, b=0.75)


# Batch BM25 SEARCH (the serving shape): three literal queries answered in
# one token-stream pass — shared tf/df/dl statistics, broadcast query-term
# table, per-query windowed top-5 on the rounded decimal-summed score.
_BM25_QUERIES = [
    ("q_scan", ["table", "scan"]),
    ("q_join", ["query", "join", "fast"]),
    ("q_stream", ["stream", "window"]),
]
_BM25_Q_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)
_BM25_ALL_TERMS = ", ".join(
    f"'{t}'" for t in sorted({t for _, ts in _BM25_QUERIES for t in ts})
)


@register(
    "bm25_search_topk",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
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
    )
    SELECT query_id, doc_id, bm25, rn FROM (
        SELECT query_id, doc_id, bm25,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM scored) WHERE rn <= 5
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    return bm25_multi_topk(
        d, _BM25_QUERIES, "doc_id", "text", top_k=5
    )


# Reciprocal-rank fusion (Cormack et al. 2009) — the hybrid-search
# combiner: fuse the BM25 relevance ranking with a recency ranking
# (doc_id desc as ingest-order proxy) via 1/(60+rank) sums. Rank
# arithmetic only — engine-stable by construction; the window runs over
# ≤ top_k rows per query.
@register(
    "rrf_fuse_q",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
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
    fused AS (
        SELECT query_id, doc_id, rn,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY doc_id DESC) AS rrank
        FROM topk)
    SELECT query_id, doc_id,
           ROUND(1.0 / (60 + rn) + 1.0 / (60 + rrank), 6) AS rrf,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY 1.0 / (60 + rn) + 1.0 / (60 + rrank) DESC,
                        doc_id ASC) AS INT) AS rn_fused
    FROM fused
    """,
)
def rrf_fuse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    topk = bm25_multi_topk(d, _BM25_QUERIES, "doc_id", "text", top_k=5)
    w_rec = Window.partitionBy("query_id").orderBy(F.col("doc_id").desc())
    fused = topk.withColumn("rrank", F.row_number().over(w_rec))
    rrf = 1.0 / (60 + F.col("rn")) + 1.0 / (60 + F.col("rrank"))
    w_f = Window.partitionBy("query_id").orderBy(
        rrf.desc(), F.col("doc_id").asc()
    )
    return fused.select(
        "query_id",
        "doc_id",
        F.round(rrf, 6).alias("rrf"),
        F.row_number().over(w_f).cast("int").alias("rn_fused"),
    )


@register(
    "inverted_index_q",
    f"""
    WITH p AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_TOK_ROWS})),
    df AS (SELECT tok, count(*)::BIGINT AS df FROM p GROUP BY tok),
    capped AS (SELECT tok, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY tok
                                         ORDER BY doc_id) AS rn
               FROM p),
    post AS (SELECT tok,
                    array_to_string(list(doc_id ORDER BY doc_id), ',')
                        AS postings
             FROM capped WHERE rn <= 100 GROUP BY tok)
    SELECT tok, df, postings
    FROM df JOIN post USING (tok)
    WHERE df >= 50
    """,
)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return inverted_index(d, "doc_id", "text", min_df=50, max_postings=100)


@register(
    "token_pmi_q",
    f"""
    WITH p AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_TOK_ROWS})),
    v AS (SELECT tok, count(*) AS df FROM p GROUP BY tok
          ORDER BY df DESC, tok LIMIT 50),
    pv AS (SELECT p.doc_id, p.tok FROM p JOIN v USING (tok)),
    n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM p),
    co AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
                  count(*)::BIGINT AS pair_count
           FROM pv a JOIN pv b
             ON a.doc_id = b.doc_id AND a.tok < b.tok
           GROUP BY a.tok, b.tok
           HAVING count(*) >= 10)
    SELECT tok_a, tok_b, pair_count,
           ROUND(CAST(ln(pair_count * n_docs / (va.df * vb.df))
                      AS DECIMAL(28,12)), 6)::DOUBLE AS pmi
    FROM co
    JOIN v va ON va.tok = co.tok_a
    JOIN v vb ON vb.tok = co.tok_b
    CROSS JOIN n
    """,
)
def token_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return token_pmi(d, "doc_id", "text", vocab_size=50, min_pair_count=10)


# ---------------------------------------------------------------------------
# PageRank over the derived star-schema DAG (plans/graph.py:pagerank) —
# fixed 2-iteration budget, oracle replays each iteration as a chained CTE.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.plans.graph import pagerank  # noqa: E402

_PR_STEP = """
    c{i} AS (SELECT e.dst AS node,
                    SUM(CAST(r.rank / d.outdeg AS DECIMAL(28,12))) AS in_sum
             FROM r{p} r
             JOIN edges e ON r.node = e.src
             JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
    r{i} AS (SELECT n.node,
                    ROUND(CAST((CAST(1.0 AS DOUBLE) - 0.85)
                               + CAST(0.85 AS DOUBLE)
                                 * COALESCE(c{i}.in_sum::DOUBLE, 0.0)
                               AS DECIMAL(28,12)), 8)::DOUBLE AS rank
             FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)
"""


@register(
    "pagerank_top",
    f"""
    WITH {_EDGES_ORACLE},
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges
              UNION
              SELECT dst FROM edges),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    {_PR_STEP.format(i=1, p=0)},
    {_PR_STEP.format(i=2, p=1)}
    SELECT node, rank FROM r2
    """,
)
def pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return pagerank(_derived_edges(cat), iters=2, damping=0.85)


# ---------------------------------------------------------------------------
# Time-series resample + linear interpolation (operators/timeseries.py).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.timeseries import (  # noqa: E402
    resample_interpolate,
)


@register(
    "resample_interpolate_q",
    """
    WITH obs AS (
        SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
               ROUND(CAST(avg(value) AS DECIMAL(28,12)), 6)::DOUBLE
                   AS observed
        FROM events WHERE user_id < 30 GROUP BY 1, 2
    ),
    grid AS (
        SELECT key,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT key, min(bucket) AS b0, max(bucket) AS b1
              FROM obs GROUP BY key)
    ),
    g AS (
        SELECT grid.key, grid.bucket, obs.observed
        FROM grid LEFT JOIN obs
          ON obs.key = grid.key AND obs.bucket = grid.bucket
    ),
    w AS (
        SELECT key, bucket, observed,
               last_value(observed IGNORE NULLS) OVER pw AS pv,
               last_value(CASE WHEN observed IS NOT NULL THEN bucket END
                          IGNORE NULLS) OVER pw AS pt,
               first_value(observed IGNORE NULLS) OVER nw AS nv,
               first_value(CASE WHEN observed IS NOT NULL THEN bucket END
                           IGNORE NULLS) OVER nw AS nt
        FROM g
        WINDOW pw AS (PARTITION BY key ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               nw AS (PARTITION BY key ORDER BY bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT key, bucket, observed,
           CASE WHEN observed IS NOT NULL THEN observed
                ELSE ROUND(CAST(
                    pv + (nv - pv) * ((epoch(bucket) - epoch(pt))
                                      / (epoch(nt) - epoch(pt)))
                    AS DECIMAL(28,12)), 6)::DOUBLE
           END AS value
    FROM w
    """,
)
def resample_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(F.col("user_id") < 30)
    return resample_interpolate(
        e, key_col="user_id", ts_col="ts", value_col="value", step="1 hour"
    )


# ---------------------------------------------------------------------------
# Event-stream behavioral analytics (operators/cohorts.py): gap-based
# sessionization, weekly cohort retention, signup->purchase conversion lag.
# All pure Catalyst; the user key is the only shuffle key in each.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.cohorts import (  # noqa: E402
    cohort_retention,
    sessionize,
    time_to_convert,
)


@register(
    "sessionize_events",
    """
    WITH t AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INT) AS session_seq
        FROM t
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return sessionize(e, gap_minutes=30)


@register(
    "cohort_retention_q",
    """
    WITH f AS (
        SELECT user_id, min(date_trunc('week', ts)::DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS active_week
        FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INT)
               AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return cohort_retention(e)


@register(
    "time_to_convert_q",
    """
    WITH u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS start_ts
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS conv_ts
        FROM events e JOIN u ON e.user_id = u.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= u.start_ts
        GROUP BY e.user_id
    )
    SELECT u.user_id, u.start_ts,
           CAST(date_diff('second', u.start_ts, c.conv_ts) AS BIGINT)
               AS convert_secs
    FROM u LEFT JOIN c ON c.user_id = u.user_id
    WHERE u.start_ts IS NOT NULL
    """,
)
def time_to_convert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return time_to_convert(e)


# ---------------------------------------------------------------------------
# Training-data assembly ops: deterministic split assignment, concat-then-
# chunk sequence packing, and daily-count anomaly screening.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import hash_split  # noqa: E402


@register(
    "train_test_split",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_SQL_POLY.format(s="doc_id::VARCHAR")} % 100 < 80
                THEN 'test'
                WHEN {_SQL_POLY.format(s="doc_id::VARCHAR")} % 100 < 90
                THEN 'train'
                ELSE 'val' END AS split
    FROM documents
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic split; sorted-label order is
    (test, train, val) so the first 80 residues map to the first sorted
    label — the oracle mirrors that ordering."""
    d = Catalog(spark, sf_dir).documents
    return hash_split(
        d, "doc_id", {"test": 0.8, "train": 0.1, "val": 0.1}
    ).select("doc_id", "lang", "split")


@register(
    "pack_sequences_q",
    f"""
    WITH t AS (
        SELECT source, doc_id, len({_SQL_TOKENS}) AS n_tok FROM documents
    ),
    o AS (
        SELECT source, doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS off
        FROM t
    )
    SELECT source, CAST(off // 256 AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS chunk_tokens
    FROM o GROUP BY source, chunk_id
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    data layout): within each source shard, docs are laid out in doc_id
    order and cut into 256-token chunks by starting offset. One window
    pass + one map-side-combined groupBy, both keyed on the shard — at
    cluster scale the shard key IS the partition key, so the running
    offset never needs a global sort."""
    d = Catalog(spark, sf_dir).documents
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = d.select(
        "source",
        "doc_id",
        F.size(_tokens("text")).cast("long").alias("n_tok"),
    ).withColumn("off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        t.withColumn("chunk_id", (F.col("off") / F.lit(256)).cast("long"))
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("chunk_tokens"),
        )
    )


@register(
    "anomaly_zscore",
    """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
           ROUND(CAST(
               (n_events - avg(n_events) OVER w)
               / stddev_samp(n_events) OVER w
               AS DECIMAL(28,12)), 6)::DOUBLE AS zscore
    FROM d
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count z-score per event type: one groupBy to day granularity
    (map-side combined), then a per-type window over the tiny
    (type × day) frame. The corpus-sized table is touched once."""
    e = Catalog(spark, sf_dir).events
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("event_type")
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.stddev_samp(
        "n_events"
    ).over(w)
    return d.select(
        "event_type",
        "day",
        "n_events",
        F.round(z.cast("decimal(28,12)"), 6).cast("double").alias("zscore"),
    )


# ---------------------------------------------------------------------------
# CDC apply-changes (operators/cdc.py): keyed changelog -> new snapshot.
# The changelog is synthesized deterministically from orders so the oracle
# can replay it: keys %5==0 get an update (seq 1); keys %10==0 additionally
# get a delete (seq 2) that wins; keys offset by 10^7 arrive as inserts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.cdc import apply_changes  # noqa: E402


@register(
    "cdc_apply_changes",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    changes AS (
        SELECT o_orderkey, o_orderstatus,
               ROUND(o_totalprice * 2, 2) AS o_totalprice,
               'U' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, 'D' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'N' AS o_orderstatus,
               o_totalprice, 'I' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 1000 = 1
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey
                ORDER BY seq DESC, (op = 'D') DESC, op DESC
            ) AS rn FROM changes
        ) WHERE rn = 1
    )
    SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
    FROM base b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
    WHERE l.o_orderkey IS NULL
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM latest WHERE op <> 'D'
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
            F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
        )
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit("D").alias("op"),
            F.lit(2).alias("seq"),
        )
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 1000 == 1)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            F.lit("I").alias("op"),
            F.lit(1).alias("seq"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return apply_changes(base, changes, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Join/function breadth batch 3: full-outer reconciliation, null-safe
# equality join, map-type construction/extraction.
# ---------------------------------------------------------------------------
@register(
    "full_outer_reconcile",
    """
    WITH a AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_mktsegment = 'BUILDING'
    )
    SELECT COALESCE(a.o_custkey, b.c_custkey) AS custkey,
           a.n_orders, b.c_acctbal,
           CASE WHEN a.o_custkey IS NULL THEN 'segment_only'
                WHEN b.c_custkey IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.c_custkey
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation report between two derived sides — the full-outer
    keeps rows unique to either. Both sides pre-aggregate/filter before
    the join, so the join runs at key cardinality, not fact cardinality."""
    cat = Catalog(spark, sf_dir)
    a = cat.orders.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    b = cat.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_acctbal"
    )
    j = a.join(b, a.o_custkey == b.c_custkey, "full_outer")
    presence = (
        F.when(F.col("o_custkey").isNull(), "segment_only")
        .when(F.col("c_custkey").isNull(), "orders_only")
        .otherwise("both")
    )
    return j.select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "n_orders",
        "c_acctbal",
        presence.alias("presence"),
    )


@register(
    "nullsafe_join_nations",
    """
    WITH n AS (
        SELECT n_nationkey, n_name,
               CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS rk
        FROM nation
    )
    SELECT a.n_name AS name_a, b.n_name AS name_b, a.rk
    FROM n a JOIN n b
      ON a.rk IS NOT DISTINCT FROM b.rk
     AND a.n_nationkey < b.n_nationkey
    """,
)
def nullsafe_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): NULL keys match each other — the MySQL
    spaceship the reference's generated SQL relies on for nullable
    mapping columns. Catalyst plans <=> as a hash join key (EqualNullSafe
    is a valid equi-join expression), not a cross product."""
    nt = Catalog(spark, sf_dir).nation.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_regionkey") == 0, None)
        .otherwise(F.col("n_regionkey"))
        .alias("rk"),
    )
    a, b = nt.alias("a"), nt.alias("b")
    return (
        a.join(
            b,
            F.col("a.rk").eqNullSafe(F.col("b.rk"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.col("a.rk"),
        )
    )


@register(
    "map_funcs",
    """
    WITH m AS (
        SELECT p_partkey,
               MAP(['brand', 'type'], [p_brand, p_type]) AS attrs
        FROM part
    )
    SELECT p_partkey,
           (attrs['brand'])[1] AS brand,
           CAST(cardinality(attrs) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(attrs)), ',') AS keys_csv
    FROM m
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + extraction + key introspection (F5's list/map
    cell model as first-class types). The map never reaches the compared
    output — only extracted scalars, so engine map-rendering differences
    can't affect the hash."""
    p = Catalog(spark, sf_dir).part
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        m.getItem("brand").alias("brand"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


# ---------------------------------------------------------------------------
# Equal-frequency binning (feature engineering counterpart of the
# equal-width histogram_bins): NTILE deciles over account balances, then
# per-bin ranges/counts. The window orders by (value, key) so ties land
# deterministically in the same bin on both engines.
# ---------------------------------------------------------------------------
@register(
    "quantile_bins",
    """
    WITH t AS (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS bin
        FROM customer
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           min(c_acctbal) AS lo,
           max(c_acctbal) AS hi
    FROM t GROUP BY bin
    """,
)
def quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile boundaries over the full dimension. NTILE semantics
    come from operators.indexing.global_ntile (range-partitioned global
    rank + arithmetic bucketing), so no single-partition window exists at
    any dimension size; the oracle keeps plain ANSI NTILE."""
    c = Catalog(spark, sf_dir).customer
    t = global_ntile(
        c.select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        10,
        "bin",
    )
    return t.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )


# ---------------------------------------------------------------------------
# Z-order layout key: bit-interleave two join/filter dimensions so a range
# partition on the z-value co-locates rows close in BOTH dimensions — the
# multi-dimensional clustering trick behind OPTIMIZE ZORDER, as a pure
# Catalyst expression. 16 bits per dimension here; the query returns the
# layout key plus its per-z-range row counts so the oracle pins the full
# interleave arithmetic.
# ---------------------------------------------------------------------------
def _zorder16(a, b):
    """Interleave the low 16 bits of integer columns a (even positions)
    and b (odd positions) into one 32-bit z-value, JVM-side."""
    z = F.lit(0).cast("long")
    # disjoint bit positions, so + is the bitwise OR (Column | is boolean OR)
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i) % 2, 2 * i).cast("long")
            + F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1).cast("long")
        )
    return z


@register(
    "zorder_layout",
    """
    WITH z AS (
        SELECT o_orderkey, o_custkey,
               (SELECT SUM(
                   ((o_orderkey // (1 << i)) % 2) * (1 << (2 * i))
                   + ((o_custkey // (1 << i)) % 2) * (1 << (2 * i + 1))
               ) FROM range(16) r(i)) AS zval
        FROM orders
    )
    SELECT CAST(zval // 65536 AS BIGINT) AS z_range,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(zval) AS BIGINT) AS z_lo,
           CAST(max(zval) AS BIGINT) AS z_hi
    FROM z GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    z = o.select(
        _zorder16(F.col("o_orderkey"), F.col("o_custkey")).alias("zval")
    )
    return (
        z.withColumn("z_range", (F.col("zval") / 65536).cast("long"))
        .groupBy("z_range")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("zval").cast("long").alias("z_lo"),
            F.max("zval").cast("long").alias("z_hi"),
        )
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics (the CBO inputs: count / ndv / nulls /
# min / max per column). Catalyst rewrites the multi-column distinct
# aggregate into one column-pruned scan per distinct column — on columnar
# storage that is the same IO as a single wide scan, and each scan carries
# its own map-side partial aggregation (plan-pinned).
# ---------------------------------------------------------------------------
@register(
    "analyze_table_stats",
    """
    WITH a AS (
        SELECT count(*) AS n,
               count(DISTINCT l_quantity) AS ndv_q,
               count(l_quantity) AS nn_q,
               min(l_quantity) AS mn_q, max(l_quantity) AS mx_q,
               count(DISTINCT l_discount) AS ndv_d,
               count(l_discount) AS nn_d,
               min(l_discount) AS mn_d, max(l_discount) AS mx_d,
               count(DISTINCT l_tax) AS ndv_t,
               count(l_tax) AS nn_t,
               min(l_tax) AS mn_t, max(l_tax) AS mx_t
        FROM lineitem
    )
    SELECT 'l_quantity' AS col_name, CAST(n AS BIGINT) AS n_rows,
           CAST(ndv_q AS BIGINT) AS ndv,
           CAST(n - nn_q AS BIGINT) AS n_nulls,
           CAST(mn_q AS DOUBLE) AS min_v, CAST(mx_q AS DOUBLE) AS max_v
    FROM a
    UNION ALL
    SELECT 'l_discount', CAST(n AS BIGINT), CAST(ndv_d AS BIGINT),
           CAST(n - nn_d AS BIGINT), CAST(mn_d AS DOUBLE), CAST(mx_d AS DOUBLE)
    FROM a
    UNION ALL
    SELECT 'l_tax', CAST(n AS BIGINT), CAST(ndv_t AS BIGINT),
           CAST(n - nn_t AS BIGINT), CAST(mn_t AS DOUBLE), CAST(mx_t AS DOUBLE)
    FROM a
    """,
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    cols = ["l_quantity", "l_discount", "l_tax"]
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs += [
            F.countDistinct(c).alias(f"ndv_{c}"),
            F.count(c).alias(f"nn_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    a = li.agg(*aggs)
    parts = [
        a.select(
            F.lit(c).alias("col_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col(f"ndv_{c}").cast("long").alias("ndv"),
            (F.col("n") - F.col(f"nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"mn_{c}").cast("double").alias("min_v"),
            F.col(f"mx_{c}").cast("double").alias("max_v"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Incremental view maintenance: keep a per-customer order count current by
# merging changelog DELTAS into the existing aggregate — the full recompute
# over the applied snapshot is the oracle, so this query PROVES
# delta-merge == recompute. At 100 TB the delta path touches only changed
# keys (changelog-sized work) instead of rescanning the fact table.
# ---------------------------------------------------------------------------
@register(
    "ivm_merge_counts",
    """
    WITH changes AS (
        SELECT o_orderkey, o_custkey, 'U' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'D' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'I' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 1000 = 1
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey
                ORDER BY seq DESC, (op = 'D') DESC, op DESC
            ) AS rn FROM changes
        ) WHERE rn = 1
    ),
    applied AS (
        SELECT b.o_custkey
        FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
        WHERE l.o_orderkey IS NULL
        UNION ALL
        SELECT o_custkey FROM latest WHERE op <> 'D'
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM applied GROUP BY o_custkey
    """,
)
def ivm_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side takes the INCREMENTAL path the oracle does not:
    old aggregate + per-key deltas from the collapsed changelog. Matching
    the oracle's full recompute is the IVM correctness proof."""
    o = Catalog(spark, sf_dir).orders
    base = o.select("o_orderkey", "o_custkey")
    changes = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey", "o_custkey", F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 0).select(
                "o_orderkey", "o_custkey", F.lit("D").alias("op"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_custkey", F.lit("I").alias("op"), F.lit(1).alias("seq"),
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(),
        (F.col("op") == "D").desc(),
        F.col("op").desc(),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # per-key delta: -1 for a delete of an existing key, +1 for an
    # upsert of a new key, 0 otherwise (update-in-place)
    in_base = base.select("o_orderkey").withColumn("_inb", F.lit(1))
    delta_rows = latest.join(in_base, "o_orderkey", "left").select(
        "o_custkey",
        F.when((F.col("op") == "D") & F.col("_inb").isNotNull(), -1)
        .when((F.col("op") != "D") & F.col("_inb").isNull(), 1)
        .otherwise(0)
        .alias("delta"),
    )
    deltas = delta_rows.groupBy("o_custkey").agg(
        F.sum("delta").alias("d")
    )
    old = base.groupBy("o_custkey").agg(F.count("*").alias("n0"))
    merged = old.join(deltas, "o_custkey", "full_outer").select(
        "o_custkey",
        (
            F.coalesce(F.col("n0"), F.lit(0))
            + F.coalesce(F.col("d"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
    )
    return merged.filter(F.col("n_orders") > 0)


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/quality.py): all observables in one
# aggregation pass, report unpivoted to rule rows.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.quality import (  # noqa: E402
    Expectation,
    check_expectations,
    distinct_count,
    null_rate,
)


@register(
    "dq_expectations",
    """
    WITH a AS (
        SELECT CAST((count(*) - count(c_acctbal)) AS DOUBLE) / count(*)
                   AS acctbal_null_rate,
               CAST(count(DISTINCT c_mktsegment) AS DOUBLE) AS n_segments,
               CAST(min(c_acctbal) AS DOUBLE) AS min_acctbal,
               CAST(count(*) AS DOUBLE) AS n_rows
        FROM customer
    )
    SELECT 'acctbal_null_rate' AS rule, acctbal_null_rate AS observed,
           0.0::DOUBLE AS lo, 0.01::DOUBLE AS hi,
           acctbal_null_rate BETWEEN 0.0 AND 0.01 AS passed FROM a
    UNION ALL
    SELECT 'n_segments', n_segments, 5.0::DOUBLE, 5.0::DOUBLE,
           n_segments BETWEEN 5.0 AND 5.0 FROM a
    UNION ALL
    SELECT 'min_acctbal', min_acctbal, -1000.0::DOUBLE, 0.0::DOUBLE,
           min_acctbal BETWEEN -1000.0 AND 0.0 FROM a
    UNION ALL
    SELECT 'n_rows', n_rows, 1.0::DOUBLE, 1e12::DOUBLE,
           n_rows BETWEEN 1.0 AND 1e12 FROM a
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four rules over customer — one intentionally failing (min_acctbal
    bound excludes the real minimum) so the report exercises both
    verdicts."""
    c = Catalog(spark, sf_dir).customer
    rules = [
        Expectation("acctbal_null_rate", null_rate("c_acctbal"), 0.0, 0.01),
        Expectation("n_segments", distinct_count("c_mktsegment"), 5.0, 5.0),
        Expectation("min_acctbal", F.min("c_acctbal"), -1000.0, 0.0),
        Expectation("n_rows", F.count(F.lit(1)), 1.0, 1e12),
    ]
    return check_expectations(c, rules)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (A-ES priority sampling, hash-derived
# draws) — inclusion scales with doc length, reproducible on any engine.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import (  # noqa: E402
    weighted_sample_topk,
)


@register(
    "weighted_sample_q",
    f"""
    WITH p AS (
        SELECT doc_id, n_chars,
               ROUND(CAST(
                   ln(({_SQL_POLY.format(s="doc_id::VARCHAR")} % 999983 + 1)
                      / 999984.0) / n_chars
                   AS DECIMAL(28,12)), 6)::DOUBLE AS priority
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority
    FROM p ORDER BY priority DESC, doc_id LIMIT 20
    """,
)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    return weighted_sample_topk(d, "doc_id", "n_chars", k=20)


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness: rolling 7-day distinct users per day. The
# corpus-sized event table reduces to the (day, user) distinct frame FIRST
# (bounded by users×days), so the 7-day range join explodes only that
# small frame against the broadcast day grid.
# ---------------------------------------------------------------------------
@register(
    "dau_wau_stickiness",
    """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts)::DATE AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, count(DISTINCT du.user_id) AS wau
        FROM days d JOIN du
          ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    )
    SELECT d.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           ROUND(CAST(dau AS DECIMAL(28,12)) / wau, 6)::DOUBLE AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    du = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().transform(pin, eager=True)
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    # each (day, user) contributes to the 7 window-end days [day, day+6]:
    # a map-side explode + equi semi-join beats a nested-loop range join
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
        "user_id",
    )
    wau = (
        contrib.join(
            F.broadcast(days.withColumnRenamed("day", "wday")),
            "wday",
            "left_semi",
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("wday", "day")
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau").cast("decimal(28,12)") / F.col("wau"), 6)
        .cast("double")
        .alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Product quantization (operators/clustering.pq_encode): 4 subspaces x 16
# dims, each an independent 2-round deterministic Lloyd clustering. The
# oracle replays every subspace's rounds with the same CTE chain as
# kmeans_assignments, generated per subspace.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import pq_encode  # noqa: E402


def _pq_subspace_sql(j: int, subdim: int = 16, k: int = 4) -> str:
    a, b = j * subdim + 1, (j + 1) * subdim
    return f"""
    e{j} AS (SELECT vec_id, (embedding::DOUBLE[])[{a}:{b}] AS v
             FROM embeddings),
    c0{j} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
              FROM e{j} ORDER BY vec_id LIMIT {k}),
    a0{j} AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e{j} e CROSS JOIN c0{j} c
        ) WHERE rn = 1
    ),
    m0{j} AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0{j}, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1{j} AS (SELECT cid, list(m ORDER BY i) AS v FROM m0{j} GROUP BY cid),
    a1{j} AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e{j} e CROSS JOIN c1{j} c
        ) WHERE rn = 1
    )"""


@register(
    "pq_codes",
    "WITH "
    + ",".join(_pq_subspace_sql(j) for j in range(4))
    + """
    SELECT a10.vec_id,
           CAST(a10.cid AS INT) AS code_0,
           CAST(a11.cid AS INT) AS code_1,
           CAST(a12.cid AS INT) AS code_2,
           CAST(a13.cid AS INT) AS code_3
    FROM a10 JOIN a11 USING (vec_id) JOIN a12 USING (vec_id)
    JOIN a13 USING (vec_id)
    """,
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return pq_encode(emb, "vec_id", "embedding", m=4, subdim=16, k=4, iters=2)


# ---------------------------------------------------------------------------
# Hierarchical rollup reuse (continuous-aggregate pattern): daily stats
# answered FROM the hourly rollup — sums/counts/mins/maxes compose, avg is
# re-derived as sum/count. The oracle aggregates the raw events directly,
# so a green row proves the two-level rollup is lossless. At 100 TB the
# hourly layer is what makes dashboard-latency dailies possible: the raw
# table is touched once per hour, not once per query.
# ---------------------------------------------------------------------------
@register(
    "rollup_reuse_daily",
    """
    SELECT event_type, date_trunc('day', ts)::DATE AS day,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(CAST(sum(value) AS DECIMAL(28,12)), 4)::DOUBLE AS total,
           ROUND(CAST(sum(value) AS DECIMAL(28,12))
                 / count(*), 6)::DOUBLE AS mean,
           min(value) AS lo, max(value) AS hi
    FROM events GROUP BY 1, 2
    """,
)
def rollup_reuse_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,12)")).alias("s"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return hourly.groupBy(
        "event_type", F.to_date("hour").alias("day")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("s").cast("decimal(28,12)"), 4)
        .cast("double")
        .alias("total"),
        (
            F.round(
                (F.sum("s").cast("decimal(28,12)") / F.sum("n")).cast(
                    "decimal(28,12)"
                ),
                6,
            )
        )
        .cast("double")
        .alias("mean"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    ).select("event_type", "day", "n", "total", "mean", "lo", "hi")


# ---------------------------------------------------------------------------
# Round-2 widening: PII redaction, Unicode normalization, char-entropy
# quality, contrastive negative sampling, per-group reservoir sampling,
# hard-negative mining, and key-skew diagnostics.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.functions.text import char_entropy, normalize_text
from iniz_exporters_spark.operators.indexing import (
    global_ntile,
    negative_sample_pairs,
)
from iniz_exporters_spark.operators.privacy import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
from iniz_exporters_spark.operators.sampling import reservoir_per_group
from iniz_exporters_spark.operators.similarity import hard_negatives
from iniz_exporters_spark.operators.skew import key_skew_profile


# The synthetic corpus carries no real PII, so the query SPIKES each doc
# with deterministic doc_id-derived PII of every kind, then redacts and
# counts — exercising all four patterns on every row in both engines.
_PII_SPIKE_SQL = (
    "text || ' contact user' || doc_id || '@example.com from 10.' || "
    "(doc_id % 200) || '.0.1 call 555-' || "
    "lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ssn 123-45-6789'"
)


def _pii_redact_sql() -> str:
    redacted = "t"
    for _, pattern, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pattern}', '{token}', 'g')"
    count_cols = ",\n           ".join(
        f"length(regexp_extract_all(t, '{pattern}'))::INT AS n_{kind}"
        for kind, pattern, _ in PII_PATTERNS
    )
    return f"""
    WITH spiked AS (SELECT doc_id, {_PII_SPIKE_SQL} AS t FROM documents)
    SELECT doc_id,
           {count_cols},
           {redacted} AS redacted
    FROM spiked
    """


@register("pii_redact", _pii_redact_sql())
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: per-kind counts + redacted text.

    Pure Catalyst regexp chain — per-row inside whole-stage codegen, zero
    shuffles; scrubbing cost is one corpus scan at any scale."""
    d = Catalog(spark, sf_dir).documents
    spiked = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.1 call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789"),
    )
    t = d.select("doc_id", spiked.alias("t"))
    counts = pii_counts("t")
    return t.select(
        "doc_id",
        *[counts[kind].cast("int").alias(f"n_{kind}") for kind, _, _ in PII_PATTERNS],
        redact_pii("t").alias("redacted"),
    )


# Whitespace class is pinned to the ASCII set so Java regex (Spark) and
# RE2 (DuckDB) agree; Python's \s would also eat U+00A0 etc., RE2's won't.
_WS_CLASS = r"[ \t\n\r\f\v]+"


@register(
    "normalize_nfc",
    f"""
    WITH spiked AS (
        SELECT doc_id,
               text || '  cafe' || chr(769) || '   nai' || chr(776) || 've'
                    || chr(9) || 'end' AS t
        FROM documents)
    SELECT doc_id,
           nfc_normalize(lower(trim(
               regexp_replace(t, '{_WS_CLASS}', ' ', 'g')))) AS norm_text,
           length(t)::INT AS n_chars_before,
           length(nfc_normalize(lower(trim(
               regexp_replace(t, '{_WS_CLASS}', ' ', 'g')))))::INT
               AS n_chars_after
    FROM spiked
    """,
)
def normalize_nfc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + whitespace/case canonicalization (the dedup-key
    pre-pass). The spike appends decomposed accents + whitespace runs so
    composition and collapsing are exercised on every row. Arrow-batched
    mapInPandas kernel (Spark has no NFC builtin) — per-row, zero
    shuffles."""
    d = Catalog(spark, sf_dir).documents
    spiked = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("  café   naïve\tend")
        ).alias("t"),
    )
    return normalize_text(spiked, "doc_id", "t")


@register(
    "char_entropy_q",
    """
    SELECT d.doc_id, length(d.text)::INT AS n_chars,
           CAST(ROUND(CAST(e.ent AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS char_entropy
    FROM documents d
    JOIN (SELECT doc_id, entropy(c) AS ent
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE length(text) > 0) chars
          GROUP BY doc_id) e USING (doc_id)
    WHERE length(d.text) > 0
    """,
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per doc (gibberish/repetition
    filter). Vectorized numpy kernel over Arrow batches; rounded in
    decimal space so DuckDB's entropy() aggregate hash-matches."""
    d = Catalog(spark, sf_dir).documents.filter(F.length("text") > 0)
    ent = char_entropy(d, "doc_id", "text")
    return ent.select(
        "doc_id",
        "n_chars",
        F.round(F.col("char_entropy").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("char_entropy"),
    )


def _negative_samples_sql(k: int, seed: int) -> str:
    poly = _SQL_POLY.format(s="(d.idx || ':' || d.j || ':' || " f"'{seed}')")
    return f"""
    WITH r AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY doc_id) AS idx
               FROM documents),
    n AS (SELECT COUNT(*)::BIGINT AS c FROM documents),
    draws AS (SELECT idx, doc_id, unnest(range(1, {k + 1})) AS j FROM r),
    pairs AS (
        SELECT d.doc_id AS anchor_id, d.j::INT AS j,
               ((d.idx - 1 + 1 + ({poly} % (n.c - 1))) % n.c) + 1 AS pidx
        FROM draws d CROSS JOIN n)
    SELECT p.anchor_id, p.j, r2.doc_id AS negative_id
    FROM pairs p JOIN r r2 ON p.pidx = r2.idx
    """


@register("negative_samples", _negative_samples_sql(k=2, seed=1))
def negative_samples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negatives: 2 deterministic uniform non-self
    partners per doc. Distributed dense ranking (range partition +
    per-partition numbering + offsets — no single-partition window), then
    one rank-keyed equi-join resolves partner ids."""
    d = Catalog(spark, sf_dir).documents
    return negative_sample_pairs(d.select("doc_id"), "doc_id", k=2, seed=1)


@register(
    "reservoir_per_group_q",
    f"""
    SELECT o_orderpriority, o_orderkey, rn FROM (
        SELECT o_orderpriority, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY {_SQL_POLY.format(s="o_orderkey::VARCHAR")} ASC,
                            o_orderkey ASC) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def reservoir_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform sample per group, content-keyed (hash-order rank) so
    every engine draws the same rows. One window shuffle on the group
    key."""
    o = Catalog(spark, sf_dir).orders
    return reservoir_per_group(
        o.select("o_orderpriority", "o_orderkey"),
        "o_orderpriority",
        "o_orderkey",
        k=3,
    ).select("o_orderpriority", "o_orderkey", "rn")


@register(
    "hard_negatives_q",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored WHERE cos >= 0.2 AND cos < 0.8
    ) t WHERE rn <= 5
    """,
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: nearest neighbors inside the [0.2, 0.8)
    cosine band — informative negatives below the near-dup threshold.
    Broadcast-queries plan; the corpus never shuffles."""
    e = Catalog(spark, sf_dir).embeddings
    return hard_negatives(
        corpus=e,
        queries=e.filter(F.col("vec_id") < 10),
        lo=0.2,
        hi=0.8,
        top_k=5,
    )


@register(
    "skew_profile",
    """
    WITH c AS (SELECT l_suppkey AS key, COUNT(*) AS cnt
               FROM lineitem GROUP BY l_suppkey),
    t AS (SELECT SUM(cnt)::BIGINT AS total, COUNT(*)::BIGINT AS n_keys
          FROM c),
    top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key ASC LIMIT 5)
    SELECT key, cnt,
           CAST(ROUND(CAST(cnt::DOUBLE / total AS DECIMAL(28,12)), 4)
                AS DOUBLE) AS share,
           CAST(ROUND(CAST(cnt::DOUBLE * n_keys / total AS DECIMAL(28,12)),
                      4) AS DOUBLE) AS skew_ratio,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rn
    FROM top CROSS JOIN t
    """,
)
def skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnostic on the lineitem supplier key: top-5 keys
    with row share and ratio-to-mean-group — the pre-flight check that
    decides whether a join needs salting/AQE skew handling."""
    li = Catalog(spark, sf_dir).lineitem
    return key_skew_profile(li, "l_suppkey", top_n=5)


# ---------------------------------------------------------------------------
# Round-2 widening, batch B: bigram LM scoring, repeated-span detection,
# BPE merge-pair statistics, JL random projection, winsorized aggregation.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.lm import (
    bigram_logprob,
    duplicate_spans,
    merge_pair_counts,
)
from iniz_exporters_spark.operators.similarity import jl_project


@register(
    "bigram_logprob_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w) AS V
          FROM (SELECT unnest(t) AS w FROM toks) u)
    SELECT p.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(ROUND(CAST(SUM(CAST(
               log2((c12.c12 + 1)::DOUBLE / (c1.c1 + v.V))
               AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS logprob
    FROM pairs p
    JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
    JOIN c1 ON p.w1 = c1.w1
    CROSS JOIN v
    GROUP BY p.doc_id
    """,
)
def bigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc log2-likelihood under an add-1 bigram LM fit on the corpus
    itself — the perplexity-style fluency filter, one level up from
    unigram_logprob. Token extraction is per-row Catalyst; statistics are
    two count aggs; scoring is a vocab-keyed join (AQE absorbs Zipf
    skew)."""
    d = Catalog(spark, sf_dir).documents
    return bigram_logprob(d, "doc_id", "text")


@register(
    "dup_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
            FROM toks WHERE len(t) >= 5),
    hashed AS (SELECT doc_id,
                      {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                          AS span_hash
               FROM idx)
    SELECT span_hash, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM hashed GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated 5-token spans across documents (span-level dedup
    candidates, after Lee et al.). Span hashes are computed per-row in
    nested higher-order functions; only (id, hash) rows reach the
    shuffle."""
    d = Catalog(spark, sf_dir).documents
    return duplicate_spans(d, "doc_id", "text", span=5, min_docs=2)


@register(
    "span_dedup_trim",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    spans AS (SELECT doc_id, i,
                     {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                         AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
                    FROM toks WHERE len(t) >= 5)),
    flagged AS (SELECT h FROM spans
                GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    covered AS (SELECT doc_id, COUNT(*) AS ncov FROM (
        SELECT DISTINCT s.doc_id, s.i + u.d AS pos
        FROM spans s JOIN flagged f ON s.h = f.h, range(0, 5) u(d))
        GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.ncov, 0) AS BIGINT) AS n_covered,
           CAST(len(t.t) - COALESCE(c.ncov, 0) AS BIGINT) AS n_kept
    FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id
    """,
    headline=True,
)
def span_dedup_trim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup APPLIED (the removal accounting after dup_spans
    flags repeated windows): per doc, how many token positions fall inside
    any cross-document 5-token span, and how many tokens survive the trim.
    Fully relational — see operators/lm.span_dedup_counts."""
    from iniz_exporters_spark.operators.lm import span_dedup_counts

    d = Catalog(spark, sf_dir).documents
    return span_dedup_counts(d, "doc_id", "text", span=5, min_docs=2)


# Per-doc n-gram novelty — the memorization-risk inverse of span dedup:
# what fraction of a doc's 5-token windows appear in NO other document.
# Low novelty = template/boilerplate; the per-doc number drives
# sampling-weight decisions where whole-doc dropping is too blunt.
@register(
    "span_novelty_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    spans AS (SELECT doc_id,
                     {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                         AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
                    FROM toks WHERE len(t) >= 5)),
    df AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(*) FILTER (WHERE nd = 1) AS BIGINT) AS n_novel,
           ROUND(CAST(CAST(COUNT(*) FILTER (WHERE nd = 1) AS DOUBLE)
                      / COUNT(*) AS DECIMAL(28,6)), 4)::DOUBLE AS novelty
    FROM spans JOIN df USING (h)
    GROUP BY doc_id
    """,
)
def span_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", _tokens("text").alias("__t")).filter(
        F.size("__t") >= 5
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 4),
        lambda i: poly_hash(F.array_join(F.slice(F.col("__t"), i, 5), " ")),
    )
    spans = toks.select(
        "doc_id", F.explode(hashes).alias("h")
    ).transform(pin)
    df_ = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        spans.join(df_, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            F.round(
                (
                    F.sum(
                        F.when(F.col("nd") == 1, 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1))
                ).cast("decimal(28,6)"),
                4,
            )
            .cast("double")
            .alias("novelty"),
        )
    )


@register(
    "bpe_merge_pairs",
    f"""
    SELECT pair, cnt, rn FROM (
        SELECT pair, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair ASC) AS rn
        FROM (SELECT substr(w, i, 2) AS pair
              FROM (SELECT w, unnest(range(1, length(w))) AS i
                    FROM (SELECT unnest({_SQL_TOKENS}) AS w FROM documents) t0
                    WHERE length(w) >= 2) t1) t2
        GROUP BY pair) t3
    WHERE rn <= 20
    """,
)
def bpe_merge_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs inside tokens — the BPE trainer's
    next-merge statistic. Explode + count with map-side partials; ordered
    limit plans as TakeOrderedAndProject."""
    d = Catalog(spark, sf_dir).documents
    return merge_pair_counts(d, "text", top_n=20)


# ---------------------------------------------------------------------------
# BPE merge-table APPLY: re-tokenize every word through a static merge table
# (the serving shape — a tokenizer ships as a fixed artifact), applied
# iteratively in rank order; rule 2 consumes rule 1's output symbol, so the
# iterative semantics are genuinely exercised. Spark side: the fold chain
# runs once per DISTINCT word (vocabulary-sized work) and broadcast-joins
# back to the token stream. Oracle side: each merge is replayed as a
# fixpoint recursive CTE of space-delimited replaces (leftmost-greedy
# replace iterated to fixpoint equals the fold — one pass of a rule can
# only miss occurrences split across a replaced boundary, which the next
# iteration catches).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.lm import (  # noqa: E402
    bpe_apply_symbols,
    bpe_learn,
)

_BPE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r")]


def _bpe_apply_sql(merges: list[tuple[str, str]]) -> str:
    ctes = [
        "f0 AS (SELECT w, ' ' || array_to_string(string_split(w, ''), ' ')"
        " || ' ' AS s FROM (SELECT DISTINCT unnest("
        + _SQL_TOKENS
        + ") AS w FROM documents))"
    ]
    for i, (a, b) in enumerate(merges, start=1):
        pat, rep = f"' {a} {b} '", f"' {a}{b} '"
        ctes.append(
            f"m{i} AS (SELECT w, s FROM f{i - 1} UNION ALL "
            f"SELECT w, replace(s, {pat}, {rep}) FROM m{i} "
            f"WHERE s <> replace(s, {pat}, {rep}))"
        )
        ctes.append(
            f"f{i} AS (SELECT w, s FROM m{i} "
            f"WHERE s = replace(s, {pat}, {rep}))"
        )
    n = len(merges)
    return f"""
    WITH RECURSIVE {", ".join(ctes)},
    seg AS (SELECT w, len(string_split(trim(s), ' ')) AS n_sym FROM f{n}),
    toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents)
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM toks JOIN seg USING (w)
    GROUP BY doc_id
    """


def _bpe_learn_sql(k: int) -> str:
    """DuckDB replay of ``bpe_learn``: per round, the weighted top pair
    (count desc, pair asc) via a scalar-subquery'd ordered LIMIT 1, then a
    fixpoint recursive-CTE replace (same machinery as _bpe_apply_sql) to
    re-segment the vocabulary before the next round. Assumes every round
    finds at least one pair (true on any non-degenerate corpus; the Spark
    side breaks out early on a dry round).

    The non-recursive members (f*, t*) are MATERIALIZED: each round
    references its predecessor several times (pattern + replacement scalar
    subqueries, fixpoint guard), so inlined CTEs expand the predecessor
    multiplicatively per round — beyond ~5 rounds the expansion re-opens
    the parquet file exponentially many times and dies on fd limits.
    Materialization makes replay depth linear (64 rounds ≈ 1.4 s at
    sf0.01)."""
    syms = "string_split(trim(s), ' ')"
    ctes = [
        "f0 AS MATERIALIZED (SELECT w, freq, ' ' || "
        "array_to_string(string_split(w, ''),"
        " ' ') || ' ' AS s FROM (SELECT w, COUNT(*) AS freq FROM ("
        f"SELECT unnest({_SQL_TOKENS}) AS w FROM documents) GROUP BY w))"
    ]
    for r in range(1, k + 1):
        pat = f"(SELECT ' '||a||' '||b||' ' FROM t{r})"
        rep = f"(SELECT ' '||a||b||' ' FROM t{r})"
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b "
            f"FROM (SELECT {syms} AS syms, freq, "
            f"unnest(range(1, len({syms}))) AS i FROM f{r - 1}) "
            "GROUP BY a, b ORDER BY SUM(freq) DESC, a ASC, b ASC LIMIT 1)"
        )
        ctes.append(
            f"m{r} AS (SELECT w, freq, s FROM f{r - 1} UNION ALL "
            f"SELECT w, freq, replace(s, {pat}, {rep}) FROM m{r} "
            f"WHERE s <> replace(s, {pat}, {rep}))"
        )
        ctes.append(
            f"f{r} AS MATERIALIZED (SELECT w, freq, s FROM m{r} "
            f"WHERE s = replace(s, {pat}, {rep}))"
        )
    ranks = " UNION ALL ".join(
        f"SELECT {r} AS rank, a, b FROM t{r}" for r in range(1, k + 1)
    )
    return f"WITH RECURSIVE {', '.join(ctes)} {ranks}"


@register("bpe_learn_q", _bpe_learn_sql(3))
def bpe_learn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training itself, driver-checked: 3 merge rounds learned on the
    corpus vocabulary (weighted by word frequency), emitted as
    (rank, a, b). The Spark side is the bpe_learn driver loop — one
    single-row collect per round; the oracle replays every round in SQL."""
    d = Catalog(spark, sf_dir).documents
    merges = bpe_learn(d, "text", k=3)
    return metadata_df(spark,
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


@register("bpe_learn64", _bpe_learn_sql(64), headline=True)
def bpe_learn64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-scale BPE training: 64 merge rounds, checkpoint cadence 8
    (seven rounds stack their merge folds as lineage on the last snapshot,
    the eighth materializes — round-trip cost amortized 8×). The corpus
    scan happens once (weighted vocab build); all 64 rounds run on
    vocabulary-sized data, so the loop cost is corpus-size-independent —
    the actual 100 TB question for SQL-replayed training, benchmarked
    here as a headline query. Oracle: the full 64-round recursive-CTE
    replay (MATERIALIZED members keep it linear in depth)."""
    d = Catalog(spark, sf_dir).documents
    merges = bpe_learn(d, "text", k=64, checkpoint_every=8)
    return metadata_df(spark,
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


@register("bpe_apply_q", _bpe_apply_sql(_BPE_MERGES), headline=True)
def bpe_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(_tokens("text")).alias("w"))
    vocab = (
        toks.select("w")
        .distinct()
        .select(
            "w",
            F.size(bpe_apply_symbols(F.col("w"), _BPE_MERGES)).alias(
                "n_sym"
            ),
        )
    )
    return toks.join(F.broadcast(vocab), "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Host/URL-level web-corpus curation (CCNet-style): the documents table has
# no URL column, so each query synthesizes a deterministic URL from
# (source, doc_id, lang) and then runs the REAL operators — parse_url
# extraction, per-host reservoir caps, per-host adaptive rate sampling.
# The oracle rebuilds the same URL and replays the string/window/gate
# arithmetic, so Spark's parse_url is checked against constructed truth.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.webcorpus import (  # noqa: E402
    apex_domain,
    canonicalize_url,
    host_cap,
    host_rate_sample,
    url_host,
)


def _synth_url() -> F.Column:
    return F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com:8443/d/"),
        F.col("doc_id"),
        F.lit("?ref="),
        F.col("lang"),
    )


@register(
    "url_parts_q",
    """
    SELECT doc_id,
           'www.' || source || '.example.com' AS host,
           'example.com' AS apex,
           '/d/' || doc_id AS path,
           lang AS ref
    FROM documents
    """,
)
def url_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    url = _synth_url()
    host = url_host(url)
    return d.select(
        "doc_id",
        host.alias("host"),
        apex_domain(host).alias("apex"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )


@register(
    "host_cap_sample",
    f"""
    WITH u AS (SELECT doc_id, source || '.example.com' AS host
               FROM documents)
    SELECT host, doc_id, rn FROM (
        SELECT host, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY host
                   ORDER BY {_SQL_POLY.format(s="doc_id::VARCHAR")} ASC,
                            doc_id ASC) AS rn
        FROM u) t
    WHERE rn <= 7
    """,
)
def host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    hosts = d.select(
        "doc_id",
        url_host(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/d/"),
                F.col("doc_id"),
            )
        ).alias("host"),
    )
    return host_cap(hosts, "host", "doc_id", cap=7).select(
        "host", "doc_id", "rn"
    )


@register(
    "host_rate_sample_q",
    f"""
    WITH u AS (SELECT doc_id, source || '.example.com' AS host
               FROM documents),
    c AS (SELECT host, COUNT(*) AS n FROM u GROUP BY host)
    SELECT host, COUNT(*) AS n_kept
    FROM u JOIN c USING (host)
    WHERE ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % n < 5
    GROUP BY host
    """,
)
def host_rate_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    hosts = d.select(
        "doc_id",
        url_host(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/d/"),
                F.col("doc_id"),
            )
        ).alias("host"),
    )
    return (
        host_rate_sample(hosts, "host", "doc_id", target=5)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# URL canonicalization — the dedup key for web documents: the Spark side
# parses a deliberately MESSY synthesized URL (uppercase host, default
# port, tracking params, trailing slash) with real parse_url machinery;
# the oracle constructs the clean truth directly from the source columns.
@register(
    "url_canonicalize_q",
    """
    SELECT doc_id,
           'https://www.' || source || '.example.com/d/' || doc_id
               || '?ref=' || lang AS canon_url
    FROM documents
    """,
)
def url_canonicalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    messy = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/d/"),
        F.col("doc_id"),
        F.lit("/?utm_source=x&ref="),
        F.col("lang"),
    )
    return d.select(
        "doc_id", canonicalize_url(messy).alias("canon_url")
    )


# Int8 embedding quantization contract: the per-vector scale is exact
# arithmetic (max |v| / 127) and the reconstruction error of symmetric
# round-to-nearest quantization is ≤ scale/2 by construction — emitted as
# a boolean, so the check is stable regardless of either engine's rounding
# tie convention.
@register(
    "int8_quantize_check",
    """
    SELECT vec_id,
           ROUND(CAST(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127
                 AS DECIMAL(28,8)), 6)::DOUBLE AS scale_r,
           TRUE AS q_ok
    FROM embeddings
    """,
)
def int8_quantize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    absv = F.transform(
        F.col("embedding"), lambda x: F.abs(x.cast("double"))
    )
    scale = F.array_max(absv) / 127
    err = F.array_max(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                x.cast("double")
                - F.round(x.cast("double") / scale) * scale
            ),
        )
    )
    return e.select(
        "vec_id",
        F.round(scale.cast("decimal(28,8)"), 6)
        .cast("double")
        .alias("scale_r"),
        F.when(scale == 0, F.lit(True))
        .otherwise(err <= scale * 0.5 + F.lit(1e-12))
        .alias("q_ok"),
    )


# Distribution drift between corpus slices: per-token PSI contributions
# (population stability index) over the top-50 vocabulary, comparing the
# even-numbered sources against the odd ones. THE monitoring number for
# "did the ingest mix shift" — decimal-summed probabilities, add-one
# smoothing so no log sees zero.
@register(
    "token_psi_q",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok, source
               FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                                             tok ASC) AS rn
              FROM t GROUP BY tok) WHERE rn <= 50),
    c AS (SELECT tok,
                 SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                          THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1
                          THEN 1 ELSE 0 END) AS cb
          FROM t JOIN v USING (tok) GROUP BY tok),
    tot AS (SELECT CAST(SUM(ca) AS DOUBLE) AS ta,
                   CAST(SUM(cb) AS DOUBLE) AS tb,
                   CAST(COUNT(*) AS DOUBLE) AS nv
            FROM c)
    SELECT tok,
           CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
           ROUND(CAST(((ca + 1) / (ta + nv) - (cb + 1) / (tb + nv))
                      * ln(((ca + 1) / (ta + nv))
                           / ((cb + 1) / (tb + nv)))
                 AS DECIMAL(28,12)), 8)::DOUBLE AS psi_contrib
    FROM c CROSS JOIN tot
    """,
)
def token_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        F.explode(_tokens("text")).alias("tok"),
        (F.substring("source", 4, 10).cast("int") % 2).alias("half"),
    )
    vocab = (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("tok").asc())
        .limit(50)
        .select("tok")
    )
    c = (
        t.join(F.broadcast(vocab), "tok")
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    tot = c.agg(
        F.sum("ca").cast("double").alias("ta"),
        F.sum("cb").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("double").alias("nv"),
    )
    pa = (F.col("ca") + 1) / (F.col("ta") + F.col("nv"))
    pb = (F.col("cb") + 1) / (F.col("tb") + F.col("nv"))
    return c.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.col("ca").cast("long").alias("n_a"),
        F.col("cb").cast("long").alias("n_b"),
        F.round(
            ((pa - pb) * F.log(pa / pb)).cast("decimal(28,12)"), 8
        )
        .cast("double")
        .alias("psi_contrib"),
    )


# Corpus-mix audit: per-source language distribution — the dashboard
# number a mixture_sample run is tuned against. One groupBy, fractions in
# decimal space.
@register(
    "lang_mix_by_source",
    """
    SELECT source, lang, COUNT(*) AS n,
           ROUND(CAST(CAST(COUNT(*) AS DOUBLE)
                      / SUM(COUNT(*)) OVER (PARTITION BY source)
                 AS DECIMAL(28,6)), 4)::DOUBLE AS frac
    FROM documents GROUP BY source, lang
    """,
)
def lang_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "lang",
        "n",
        F.round(
            (F.col("n").cast("double") / F.sum("n").over(w)).cast(
                "decimal(28,6)"
            ),
            4,
        )
        .cast("double")
        .alias("frac"),
    )


# Exact-duplicate rate per source — the first number a dedup pass reports.
@register(
    "dedup_rate_by_source",
    """
    WITH g AS (SELECT source, md5(text) AS h, COUNT(*) AS c
               FROM documents GROUP BY source, md5(text))
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs
    FROM g GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    g = d.groupBy("source", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return g.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
    )


# Robust per-source length outliers: median/MAD (not mean/std — robust to
# the very outliers being hunted) over integer doc lengths, so every
# statistic is a median of integers or half-integers: exactly
# representable, no rounding hazard. The flagged count per source is the
# drift/corruption screen a corpus ingest runs per shard.
@register(
    "mad_outliers_q",
    """
    WITH m AS (
        SELECT source,
               CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS med
        FROM documents GROUP BY source),
    d AS (
        SELECT doc_id, documents.source, n_chars, med,
               abs(n_chars - med) AS dev
        FROM documents JOIN m ON documents.source = m.source),
    s AS (
        SELECT source, med,
               CAST(quantile_cont(dev, 0.5) AS DOUBLE) AS mad
        FROM d GROUP BY source, med)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           s.med, s.mad,
           CAST(COUNT(*) FILTER (WHERE d.dev > 3 * s.mad) AS BIGINT)
               AS n_outliers
    FROM d JOIN s ON d.source = s.source
    GROUP BY d.source, s.med, s.mad
    """,
)
def mad_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    med = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = d.join(med, "source").select(
        "source", "med", F.abs(F.col("n_chars") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("source", "med").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad.select("source", "mad"), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# Corpus snapshot diff — dataset-versioning accounting between two corpus
# versions (here: v2 synthesized from v1 — every 7th doc edited, every
# 10th doc removed): full-outer join on the doc key comparing content
# hashes, one status row per doc. At 100 TB both sides reduce to
# (id, md5) before the join — text never shuffles.
@register(
    "corpus_diff_q",
    """
    WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
    b AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 10 <> 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h = b.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def corpus_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    a = d.select("doc_id", F.md5("text").alias("h"))
    b = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    a2 = a.select(F.col("doc_id").alias("a_id"), F.col("h").alias("a_h"))
    b2 = b.select(F.col("doc_id").alias("b_id"), F.col("h").alias("b_h"))
    return a2.join(
        b2, a2["a_id"] == b2["b_id"], "full_outer"
    ).select(
        F.coalesce(F.col("a_id"), F.col("b_id")).alias("doc_id"),
        F.when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_h") == F.col("b_h"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules + tokenizer OOV coverage — the two
# standard curation dials beside the classifier/heuristic scores already in
# the registry. Both pure Catalyst; the OOV vocabulary is a top-K frame
# that broadcasts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.curation import (  # noqa: E402
    GOPHER_STOPWORDS,
    gopher_quality,
    oov_rate,
    top_k_vocab,
)

_GOPHER_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"


@register(
    "gopher_filter_q",
    rf"""
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               ROUND(CAST(CAST(list_sum(list_transform(ws, x -> length(x)))
                               AS DOUBLE) / len(ws)
                          AS DECIMAL(28,6)), 4)::DOUBLE AS mean_word_len,
               ROUND(CAST(CAST(len(list_filter(ws,
                                   x -> regexp_matches(x, '[a-zA-Z]')))
                               AS DOUBLE) / len(ws)
                          AS DECIMAL(28,6)), 4)::DOUBLE AS frac_alpha_words,
               len(list_intersect(list_distinct(ws), {_GOPHER_STOP_SQL}))
                   AS n_stopwords
        FROM w WHERE len(ws) > 0)
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopwords,
           (n_words BETWEEN 10 AND 100000)
           AND (mean_word_len BETWEEN 2.0 AND 12.0)
           AND frac_alpha_words >= 0.8
           AND n_stopwords >= 1 AS keep
    FROM m
    """,
)
def gopher_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", *gopher_quality(F.col("text"))).filter(
        F.col("n_words") > 0
    )


@register(
    "oov_rate_q",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC)
                         AS rn
              FROM t GROUP BY tok) WHERE rn <= 100)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(CAST(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / COUNT(*)
                      AS DECIMAL(28,6)), 4)::DOUBLE AS oov_rate
    FROM t LEFT JOIN v ON t.tok = v.tok
    GROUP BY doc_id
    """,
)
def oov_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    vocab = top_k_vocab(toks, "tok", 100)
    return oov_rate(toks, "doc_id", "tok", vocab)


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics — the feature-standardization audit
# (mean/std per dim feeds z-scoring, whitening, and drift monitors).
# Cross-row sums go through exact DECIMAL (order-independent) so the
# per-dim mean/std hash-match across engines; per-element squares are
# deterministic double ops.
# ---------------------------------------------------------------------------
@register(
    "embedding_dim_stats",
    """
    WITH ex AS (SELECT unnest(range(len(embedding))) AS pos,
                       unnest(embedding) AS v
                FROM embeddings)
    SELECT pos, COUNT(*) AS n,
           ROUND(CAST(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                      / COUNT(*) AS DECIMAL(28,8)), 4)::DOUBLE AS mean,
           ROUND(CAST(sqrt(
                 CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                               AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
                 - pow(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                       / COUNT(*), 2)) AS DECIMAL(28,8)), 4)::DOUBLE AS std
    FROM ex GROUP BY pos
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    s = F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
    ssq = F.sum(
        (F.col("v").cast("double") * F.col("v").cast("double")).cast(
            "decimal(28,10)"
        )
    ).cast("double")
    n = F.count(F.lit(1))
    return ex.groupBy(F.col("pos").cast("long").alias("pos")).agg(
        n.alias("n"),
        F.round((s / n).cast("decimal(28,8)"), 4)
        .cast("double")
        .alias("mean"),
        F.round(
            F.sqrt(ssq / n - F.pow(s / n, F.lit(2))).cast("decimal(28,8)"),
            4,
        )
        .cast("double")
        .alias("std"),
    )


# Whitening applied: each vector z-scored per dimension against the
# corpus stats above, reported as the whitened L2 norm (the Mahalanobis-
# with-diagonal-covariance distance from the corpus mean — the outlier
# score feeding embedding-space pruning). The 64-row stats frame is a
# metadata-scale collect (the IVF-centroid convention); the z-transform
# itself is one codegen'd fold per row, no joins, no shuffle beyond the
# stats agg.
@register(
    "whitened_norm_q",
    """
    WITH ex AS (SELECT unnest(range(len(embedding))) AS pos,
                       unnest(embedding) AS v
                FROM embeddings),
    st AS (SELECT pos,
                  CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                      / COUNT(*) AS mean,
                  sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                                     AS DECIMAL(28,10))) AS DOUBLE)
                       / COUNT(*)
                       - pow(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                             / COUNT(*), 2)) AS std
           FROM ex GROUP BY pos),
    arr AS (SELECT list(mean ORDER BY pos) AS means,
                   list(std ORDER BY pos) AS stds FROM st)
    SELECT vec_id,
           ROUND(CAST(sqrt(list_reduce(
               list_transform(range(1, len(embedding) + 1),
                   i -> pow((CAST(embedding[i] AS DOUBLE) - means[i])
                            / stds[i], 2)),
               (a, b) -> a + b)) AS DECIMAL(28,8)), 4)::DOUBLE
               AS whitened_norm
    FROM embeddings, arr
    """,
)
def whitened_norm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    s = F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
    ssq = F.sum(
        (F.col("v").cast("double") * F.col("v").cast("double")).cast(
            "decimal(28,10)"
        )
    ).cast("double")
    n = F.count(F.lit(1))
    stats = (
        ex.groupBy("pos")
        .agg(
            (s / n).alias("mean"),
            F.sqrt(ssq / n - F.pow(s / n, F.lit(2))).alias("std"),
        )
        .orderBy("pos")
        .collect()  # metadata-scale: one row per embedding dimension
    )
    means = F.array(*[F.lit(r["mean"]) for r in stats])
    stds = F.array(*[F.lit(r["std"]) for r in stats])
    z2 = F.transform(
        F.sequence(F.lit(1), F.size("embedding")),
        lambda i: F.pow(
            (F.element_at("embedding", i).cast("double")
             - F.element_at(means, i))
            / F.element_at(stds, i),
            F.lit(2),
        ),
    )
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(z2, F.lit(0.0), lambda a, x: a + x)
            ).cast("decimal(28,8)"),
            4,
        )
        .cast("double")
        .alias("whitened_norm"),
    )


# Bounded-error contract for the approx-quantile family (the
# approx_distinct_check pattern): the estimate itself is
# implementation-defined, its error bound is engine-stable.
@register(
    "approx_quantile_check",
    """
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS exact_p50,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.expr(
                    "percentile(l_extendedprice, 0.5)"
                ).cast("decimal(28,3)"),
                2,
            )
            .cast("double")
            .alias("exact_p50"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.5, 10000)"
            ).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (
                F.abs(F.col("__approx") - F.col("exact_p50"))
                <= 0.02 * F.col("exact_p50")
            ).alias("approx_ok"),
        )
    )


def _jl_sql(dim: int, out_dims: int) -> str:
    projs = []
    for j in range(out_dims):
        poly = _SQL_POLY.format(s=f"(d || ':{j}')")
        projs.append(
            f"CAST(ROUND(CAST(list_reduce(list_transform(range(1, {dim + 1}),"
            f" d -> v[d] * (CASE WHEN {poly} % 2 = 0 THEN 1.0 ELSE -1.0 END)),"
            f" (a, b) -> a + b) AS DECIMAL(28,10)), 4) AS DOUBLE) AS p{j}"
        )
    cols = ",\n           ".join(projs)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           {cols}
    FROM e
    """


@register("jl_project_q", _jl_sql(dim=64, out_dims=4))
def jl_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ±1 Johnson-Lindenstrauss projection of the 64-dim
    embeddings to 4 dims — one codegen'd scan, zero shuffles; the scale
    path that makes downstream bucketing/clustering width-independent."""
    e = Catalog(spark, sf_dir).embeddings
    return e.select("vec_id", *jl_project(F.col("embedding"), dim=64))


@register(
    "winsorize_prices",
    """
    WITH q AS (SELECT l_returnflag,
                      CAST(quantile_cont(l_extendedprice, 0.05)
                           AS DECIMAL(18,4)) AS lo,
                      CAST(quantile_cont(l_extendedprice, 0.95)
                           AS DECIMAL(18,4)) AS hi
               FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(q.lo AS DOUBLE) AS lo,
           CAST(q.hi AS DOUBLE) AS hi,
           ROUND(CAST(SUM(least(greatest(
                   CAST(l_extendedprice AS DECIMAL(18,4)), q.lo), q.hi))
                 AS DOUBLE) / COUNT(*), 2) AS mean_winsorized
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.lo, q.hi
    """,
)
def winsorize_prices_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clamp to the exact [p05, p95] band then
    average — the robust-statistics pre-pass for noisy numeric features.
    Percentiles go through the decimal(18,4) pin (interpolation of 2-dp
    money is exact at 3 dp, see percentile_agg) so both engines clamp at
    identical cut points; the clamped sum is an exact decimal aggregate.
    Plan: one percentile agg (3 groups) broadcast back onto the scan, then
    one partial-agg'd groupBy — two passes over lineitem, no wide
    shuffle."""
    li = Catalog(spark, sf_dir).lineitem
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)")
        .cast("decimal(18,4)")
        .alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)")
        .cast("decimal(18,4)")
        .alias("hi"),
    )
    clamped = F.least(
        F.greatest(_dec(F.col("l_extendedprice")), F.col("lo")), F.col("hi")
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 2
            ).alias("mean_winsorized"),
        )
        .select(
            "l_returnflag",
            "n",
            F.col("lo").cast("double").alias("lo"),
            F.col("hi").cast("double").alias("hi"),
            "mean_winsorized",
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): k-means the embeddings, then
# drop within-cluster near-duplicates keeping the lowest id. The oracle
# replays the 2 Lloyd rounds (same CTE chain as kmeans_assignments, but a1
# keeps the vector) and recomputes the max prior-id rounded cosine per row.
# tau=0.4 sits at ~p90 of this corpus's within-cluster cosine, so the kept
# flag genuinely bisects the data.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.semdedup import semdedup  # noqa: E402


@register(
    "semdedup_keep",
    f"""
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
    a1 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    p AS (SELECT a.vec_id,
                 MAX(ROUND(list_cosine_similarity(a.v, b.v), 4)) AS mx
          FROM a1 a JOIN a1 b ON a.cid = b.cid AND b.vec_id < a.vec_id
          GROUP BY a.vec_id)
    SELECT a.vec_id, CAST(a.cid AS INT) AS cluster, p.mx AS max_prior_cos,
           (p.mx IS NULL OR p.mx < 0.4) AS kept
    FROM a1 a LEFT JOIN p USING (vec_id)
    """,
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return semdedup(emb, "vec_id", "embedding", k=4, iters=2, tau=0.4)


# ---------------------------------------------------------------------------
# fastText-style linear quality classifier: hashed bag-of-words dotted with
# a deterministic weight vector, sigmoid-squashed. Pure Catalyst scan.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.quality import (  # noqa: E402
    linear_quality_score,
)

_SQL_QW = (
    "((((" + _SQL_POLY.format(s="t") + ") % 64) * 37 + 11) % 21 - 10) / 10.0"
)


@register(
    "quality_classifier",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    r AS (SELECT doc_id,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(list_transform(toks, t -> {_SQL_QW}),
                                       (a, b) -> a + b)
                 END AS raw
          FROM t)
    SELECT doc_id,
           ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0)) AS DECIMAL(28,12)),
                 4)::DOUBLE AS quality_prob,
           ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0)) AS DECIMAL(28,12)),
                 4)::DOUBLE >= 0.5 AS keep
    FROM r
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    return d.select(
        "doc_id",
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


# Classifier calibration table: fixed 0.1-wide probability buckets (a
# groupBy on floor(prob·10) — scale-safe, no global NTILE) with count and
# decimal-exact mean doc length per bucket. The table a pipeline reads
# before choosing its keep-threshold.
@register(
    "quality_calibration_q",
    f"""
    WITH t AS (SELECT doc_id, n_chars, {_SQL_TOKENS} AS toks
               FROM documents),
    r AS (SELECT doc_id, n_chars,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(list_transform(toks, t -> {_SQL_QW}),
                                       (a, b) -> a + b)
                 END AS raw
          FROM t),
    p AS (SELECT doc_id, n_chars,
                 ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0))
                       AS DECIMAL(28,12)), 4)::DOUBLE AS prob
          FROM r)
    SELECT LEAST(CAST(floor(prob * 10) AS INT), 9) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                 AS DECIMAL(28,6)), 2)::DOUBLE AS mean_len
    FROM p GROUP BY bucket
    """,
)
def quality_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    return (
        d.select("n_chars", prob.alias("prob"))
        .groupBy(
            F.least(
                F.floor(F.col("prob") * 10).cast("int"), F.lit(9)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum("n_chars").cast("double") / F.count(F.lit(1))
                ).cast("decimal(28,6)"),
                2,
            )
            .cast("double")
            .alias("mean_len"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle for training order: content-keyed md5 sort
# key — reproducible across engines/reruns/cluster sizes. The query takes
# the top-100 (TakeOrderedAndProject); the full-corpus path is
# deterministic_shuffle's repartitionByRange + local sorts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import shuffle_key  # noqa: E402

"""Registry chunk 1/9: 96 @register entries (q1_pricing_summary .. semi_join_customers).

Mechanical split of the original queries.py (lines 64-3671); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, _money, register
from iniz_exporters_spark.session import metadata_df
from iniz_exporters_spark.pinning import pin



# ---------------------------------------------------------------------------
# A1/A2/P2/O1 — flagship: TPC-H Q1-style pricing summary.
# Scale notes: single scan of lineitem, filter pushed to parquet, map-side
# partial agg on (returnflag, linestatus) — 6 groups — so the shuffle moves
# only partial aggregates. This plan survives any SF.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))
                          * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    charge = disc_price * (1 + _dec(F.col("l_tax"), 8, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
            _money(F.sum(_dec(F.col("l_extendedprice")))).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(
                F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*"), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec(F.col("l_discount"), 8, 4)).cast("double") / F.count("*"), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — projection with alias + computed column (reference
# concept_csv_export.py:316-350 aliases every output column).
# ---------------------------------------------------------------------------
@register(
    "proj_alias",
    """
    SELECT p_partkey AS part_id,
           p_name AS "Part name",
           p_brand AS "Brand",
           ROUND(CAST(CAST(p_retailprice AS DECIMAL(18,4))
                      * CAST(1.1 AS DECIMAL(8,4)) AS DOUBLE), 2) AS marked_up
    FROM part
    """,
)
def proj_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("Part name"),
        F.col("p_brand").alias("Brand"),
        F.round(
            (_dec(F.col("p_retailprice")) * F.lit(1.1).cast("decimal(8,4)")).cast(
                "double"
            ),
            2,
        ).alias("marked_up"),
    )


# ---------------------------------------------------------------------------
# P2 — equality filter (reference concept_csv_export.py:380 `retired = 0`).
# ---------------------------------------------------------------------------
@register(
    "filter_eq",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# P4 — LIKE predicate (reference stop-character audit,
# concept_csv_export.py:203,223 `LIKE '%;%'`).
# ---------------------------------------------------------------------------
@register(
    "filter_like",
    """
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE '%AND%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.filter(F.col("p_type").like("%AND%")).select("p_partkey", "p_type")


# ---------------------------------------------------------------------------
# P6/J7/E1 — anti-join exclusion (reference exclude(),
# concept_csv_export.py:452-454): customers with no orders.
# Scale notes: left_anti shuffles both sides on the key once; no fan-out.
# ---------------------------------------------------------------------------
@register(
    "anti_join_exclude",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    """,
)
def anti_join_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.orders, cat.lineitem
    returned = li.filter(F.col("l_returnflag") == "R")
    return o.join(
        returned, o.o_orderkey == returned.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# J1 — inner equi-join against a dimension, broadcast (reference
# concept_csv_export.py:354-355 concept ⋈ concept_class).
# Scale notes: part is dimension-scale → explicit broadcast removes the
# shuffle entirely; the agg shuffles only (brand) partials.
# ---------------------------------------------------------------------------
@register(
    "join_dim_broadcast",
    """
    SELECT p_brand,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    headline=True,
)
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    return (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("p_brand")
        .agg(
            _money(F.sum(disc_price)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — left join with constant conjuncts in the ON clause (reference
# concept_csv_export.py:276-284: name joins carry locale/voided predicates).
# ---------------------------------------------------------------------------
@register(
    "left_join_const_conjunct",
    """
    SELECT o.o_orderkey,
           o.o_orderstatus,
           COUNT(l.l_orderkey) AS n_returned_items
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_returnflag = 'R'
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def left_join_const_conjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.orders, cat.lineitem
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_returnflag == "R"),
            "left",
        )
        .groupBy(o.o_orderkey, o.o_orderstatus)
        .agg(F.count(li.l_orderkey).alias("n_returned_items"))
        .select(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("n_returned_items"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — chained left joins with filter-through (reference
# concept_csv_export.py:365-376: concept_set → concept → concept_name).
# region → nation → customer → orders, keeping region even when empty.
# ---------------------------------------------------------------------------
@register(
    "chain_join",
    """
    SELECT r.r_name AS region_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_spend
    FROM region r
    LEFT JOIN nation n ON r.r_regionkey = n.n_regionkey
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY r.r_name
    """,
)
def chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    r, n, c, o = cat.region, cat.nation, cat.customer, cat.orders
    return (
        r.join(F.broadcast(n), r.r_regionkey == n.n_regionkey, "left")
        .join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(r.r_name.alias("region_name"))
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            _money(F.sum(_dec(o.o_totalprice))).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — self-join (reference location parent lookup,
# location_csv_export.py:116; sql/ordertypes.sql:7-8): nation pairs that
# share a region, each pair once.
# ---------------------------------------------------------------------------
@register(
    "self_join_pairs",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("regionkey"),
        )
    )


# ---------------------------------------------------------------------------
# J6/A1/A2 — multi-way join fan-out collapsed by group-by + MAX dedup
# (reference location_csv_export.py:116-121 and the MAX() wrap at
# concept_csv_export.py:318-320).
# ---------------------------------------------------------------------------
@register(
    "fanout_regroup",
    """
    SELECT c.c_custkey,
           MAX(c.c_name) AS customer_name,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(l.l_orderkey) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey
    """,
)
def fanout_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o, li = cat.customer, cat.orders, cat.lineitem
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(c.c_custkey)
        .agg(
            F.max(c.c_name).alias("customer_name"),
            F.countDistinct(o.o_orderkey).alias("n_orders"),
            F.count(li.l_orderkey).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# O1/O2 — global sort + limit with unique tiebreaker (reference
# concept_csv_export.py:382-384 ORDER BY + LIMIT).
# ---------------------------------------------------------------------------
@register(
    "order_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E2/E3 — union of edge lists + distinct (reference members+answers union,
# concept_csv_export.py:434; exclude-set dedup 443-449).
# ---------------------------------------------------------------------------
@register(
    "union_distinct",
    """
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) t
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(cat.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


# ---------------------------------------------------------------------------
# A1 distinct-count per group (§2.4 extension: exact distinct aggregation).
# ---------------------------------------------------------------------------
@register(
    "distinct_count",
    """
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Batch 2 — MySQL-semantics aggregates, pivots, windows, rollup, audits.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.mysql import (
    group_concat_two_phase,
    mysql_group_concat,
    mysql_cast_unsigned,
    strip_newlines,
    pack_kv,
)


# A3 — GROUP_CONCAT(DISTINCT name ORDER BY weight SEPARATOR ';') (reference
# concept_csv_export.py:348-349 Members/Answers). Canonical rule:
# min-weight-wins per distinct value, value as tiebreak (SURVEY §7.3 item 1).
@register(
    "group_concat_ordered",
    """
    WITH pairs AS (
        SELECT l_orderkey, p_name, MIN(l_linenumber) AS w
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_orderkey, p_name
    )
    SELECT l_orderkey,
           string_agg(p_name, ';' ORDER BY w, p_name) AS part_names
    FROM pairs GROUP BY l_orderkey
    """,
    headline=True,
)
def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = cat.lineitem.join(
        F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
    )
    return group_concat_two_phase(
        joined, "l_orderkey", "p_name", "l_linenumber", ";", alias="part_names"
    )


# A4 — unordered distinct list-agg, implicitly sorted (reference
# location_csv_export.py:113-114 Tags/Attributes group_concat).
@register(
    "group_concat_distinct",
    """
    SELECT n.n_name AS nation_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
               AS segments
    FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def group_concat_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n, c = cat.nation, cat.customer
    return (
        n.join(c, n.n_nationkey == c.c_nationkey)
        .groupBy(n.n_name.alias("nation_name"))
        .agg(mysql_group_concat(c.c_mktsegment, sep=",").alias("segments"))
    )


# P5/F3 — MySQL CAST(x AS UNSIGNED) discriminator (reference
# concept_csv_export.py:299-306): leading digits parsed, non-numeric → 0.
@register(
    "cast_discriminator",
    """
    SELECT COALESCE(TRY_CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1)
                             AS BIGINT), 0) AS prio_num,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def cast_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.select(mysql_cast_unsigned("o_orderpriority").alias("prio_num"))
        .groupBy("prio_num")
        .agg(F.count("*").alias("n_orders"))
    )


# F1/F2/F5/F9 — scalar-function chain: newline strip, k:v pack, split+first
# (reference concept_csv_export.py:318,395; location_csv_export.py:114).
@register(
    "scalar_funcs",
    """
    SELECT doc_id,
           string_split(regexp_replace(text, '[\r\n]', '', 'g'), ' ')[1]
               AS first_word,
           length(regexp_replace(text, '[\r\n]', '', 'g')) AS n_clean_chars,
           concat(lang, ':', source) AS lang_source
    FROM documents
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    clean = strip_newlines(F.col("text"))
    return d.select(
        "doc_id",
        F.split(clean, " ").getItem(0).alias("first_word"),
        F.length(clean).alias("n_clean_chars"),
        pack_kv("lang", "source").alias("lang_source"),
    )


# R1/J3 — static pivot with declared values (reference's 45 mapping-join
# restructure, concept_csv_export.py:292-314 → one groupBy().pivot()). The
# declared value list keeps columns deterministic even when a value is absent.
@register(
    "pivot_static",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Type-pinned both sides: DuckDB COUNT(*) FILTER is BIGINT (SUM(CASE...)
    # would be HUGEINT and can hash-diverge under the driver's normalizer),
    # and an absent pivot cell is coalesced to 0 on both engines so sparse
    # scale factors can never produce a NULL-vs-0 disagreement.
    o = Catalog(spark, sf_dir).orders
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias(c)
            for c in ("F", "O", "P")
        ],
    )


# §2.5 extension — ranking window: top-3 orders per customer.
@register(
    "window_topk",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
    headline=True,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# §2.5 extension — sliding frame aggregate (decimal-exact running sums).
@register(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 4) AS mavg
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(_dec(F.col("value"))).over(w).cast("double")
            / F.count("*").over(w),
            4,
        ).alias("mavg"),
    )


# §2.4 extension — ROLLUP subtotals (grouping-sets family).
@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# §2.5 near-miss — positional sequence rank (reference
# concept_set_csv_creator.py:72-74 Sort Weight = file position).
@register(
    "seq_rank",
    """
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY doc_id) AS sort_weight
    FROM documents
    """,
)
def seq_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-based rank over the corpus WITHOUT a single-partition
    window: operators.indexing.global_index (range partition +
    per-partition numbering + broadcast offsets) reproduces ANSI
    ROW_NUMBER exactly, so the oracle keeps its plain window while the
    plan stays parallel at any corpus size (the set-creator Sort Weight
    contract, reference concept_set_csv_creator.py:40-77)."""
    from iniz_exporters_spark.operators.indexing import global_index

    d = Catalog(spark, sf_dir).documents
    return global_index(d.select("doc_id"), "doc_id", "sort_weight").select(
        "doc_id", F.col("sort_weight").cast("int").alias("sort_weight")
    )


# A6/P8 — per-column any-non-empty flags feeding the dynamic column pruner
# (reference get_columns, concept_csv_export.py:607-629).
@register(
    "any_nonempty_cols",
    """
    SELECT MAX(CASE WHEN text IS NOT NULL AND text <> '' THEN 1 ELSE 0 END)
               AS has_text,
           MAX(CASE WHEN lang IS NOT NULL AND lang <> '' THEN 1 ELSE 0 END)
               AS has_lang,
           MAX(CASE WHEN source IS NOT NULL AND source <> '' THEN 1 ELSE 0 END)
               AS has_source
    FROM documents
    """,
)
def any_nonempty_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    def flag(c):
        return F.max(
            F.when(F.col(c).isNotNull() & (F.col(c) != ""), 1).otherwise(0)
        ).alias(f"has_{c}")
    return d.agg(flag("text"), flag("lang"), flag("source"))


# A7 — stop-character audit count (reference
# concept_csv_export.py:193-235 WARNING queries).
@register(
    "audit_stopchar",
    """
    SELECT COUNT(*) AS n_offending
    FROM part
    WHERE p_name LIKE '% %'
    """,
)
def audit_stopchar(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.filter(F.col("p_name").like("% %")).agg(
        F.count("*").alias("n_offending")
    )


# ---------------------------------------------------------------------------
# Batch 3 — graph fixpoints, as-of join, streaming-window family.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.asof import asof_join
from iniz_exporters_spark.plans.graph import (
    distributed_reachable,
    distributed_topo_levels,
)

_EDGES_ORACLE = """
    edges AS (
        SELECT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst FROM orders
        UNION ALL
        SELECT DISTINCT 'o:' || l_orderkey, 'p:' || l_partkey FROM lineitem
    )
"""


def _derived_edges(cat: Catalog) -> DataFrame:
    """A 3-layer DAG derived from the star schema: customer → order → part.

    Stand-in for the reference's concept graph (Members∪Answers edges,
    concept_csv_export.py:407-530) at data scale.
    """
    c2o = cat.orders.select(
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"),
    )
    o2p = (
        cat.lineitem.select(
            F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"),
        )
        .distinct()
    )
    return c2o.unionByName(o2p)


# G1 — BFS transitive closure from a root, distributed fixpoint
# (reference get_all_concepts_in_tree, concept_csv_export.py:407-438).
@register(
    "graph_reachability",
    f"""
    WITH RECURSIVE {_EDGES_ORACLE},
    reach AS (
        SELECT 'c:1' AS node
        UNION
        SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node FROM reach
    """,
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    roots = metadata_df(spark, [("c:1",)], "node string")
    return distributed_reachable(_derived_edges(cat), roots)


# G3 — longest-path topological levels, distributed fixpoint
# (reference move_referring_concepts_down, concept_csv_export.py:499-530).
@register(
    "graph_topo_levels",
    f"""
    WITH RECURSIVE {_EDGES_ORACLE},
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    walk AS (
        SELECT node, 0 AS lvl FROM nodes
        WHERE node NOT IN (SELECT dst FROM edges)
        UNION ALL
        SELECT e.dst, w.lvl + 1 FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node, MAX(lvl) AS lvl FROM walk GROUP BY node
    """,
)
def graph_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return distributed_topo_levels(_derived_edges(cat))


# §7 extension — as-of join (backward, inclusive): each purchase matched to
# the user's most recent click at or before it. Implemented with the
# union + ordered-window carry-forward pattern: ONE shuffle on the key, no
# range explosion — the scalable shape for event-time alignment at 100 TB.
@register(
    "asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    headline=True,
)
def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        "click_ts",
    )


# §2.11 extension — tumbling event-time window (batch-first; identical
# expression runs under Structured Streaming, see streaming/windows.py).
@register(
    "tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# §2.11 extension — sliding window (2h length, 1h slide): each event lands
# in two windows; the oracle replays the assignment with a 2-row union.
@register(
    "sliding_window",
    """
    WITH assigned AS (
        SELECT date_trunc('hour', ts) AS win_start, value FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events
    )
    SELECT win_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM assigned GROUP BY win_start
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


# §2.11 extension — session window (30 min gap) per user; oracle replays the
# merge with gaps-and-islands. New session iff gap >= 30 min (Spark's session
# window is half-open [first, last+gap)).
@register(
    "session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    headline=True,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Batch 4 — training-data pipeline operators: dedup, similarity, text.
# The DuckDB oracles replay the exact polynomial-hash pipelines (the hash is
# a plain arithmetic fold precisely so the oracle can mirror it).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import (
    doc_fingerprint,
    predict_lang,
    quality_score,
    whitespace_token_count,
)
from iniz_exporters_spark.operators.dedup import (
    dedup_exact,
    minhash_signatures,
    neardup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from iniz_exporters_spark.operators.similarity import ann_bucketed, knn_bruteforce

# shared DuckDB fragments mirroring functions/text.py
_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)
_SQL_POLY = (
    "list_reduce(list_transform(string_split({s}, ''), c -> ascii(c)::BIGINT),"
    " (a, b) -> (a * 31 + b) % 1000000007)"
)
_SQL_SHINGLE_SET = (
    "list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),"
    " i -> " + _SQL_POLY.format(s="substr(text, i, 5)") + "))"
)
def _sql_minhash_sigs(num_perm: int, table: str = "documents") -> str:
    return f"""
    sh AS (SELECT doc_id, {_SQL_SHINGLE_SET} AS hs FROM {table}),
    sig AS (
        SELECT doc_id, j,
               list_min(list_transform(hs,
                   h -> ((1000003 * j + 1) * h + (7919 * j + 12345))
                        % 1000000007)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(range(0, {num_perm})) AS j) perms
    )
"""


# Exact dedup — hash-groupBy keep-first (one shuffle on the dedup key).
@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    headline=True,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


# MinHash signatures — 8 permutations over 5-char shingle sets, computed as
# per-row array expressions (zero shuffles).
@register(
    "minhash_signatures",
    f"WITH {_sql_minhash_sigs(8)} SELECT doc_id, j, minhash FROM sig",
    headline=True,
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return minhash_signatures(d, "doc_id", "text", num_perm=8, k=5)


# MinHash-LSH near-duplicate pairs — banded bucket join + exact Jaccard on
# candidates only (cost ∝ near-dup pairs, not n²).
@register(
    "neardup_pairs",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
               ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                     / (len(ha.hs) + len(hb.hs)
                        - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
        FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.7
    """,
)
def neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return neardup_pairs(
        d, "doc_id", "text", threshold=0.7, num_perm=16, rows_per_band=4, k=5
    )


# MinHash estimator quality, fully value-checked (not just bounded): for
# every LSH candidate pair, the signature-agreement estimate
# (#matching perms / 16) next to the exact shingle-set Jaccard — the
# estimator is deterministic (fixed permutations), so BOTH columns
# hash-match the oracle exactly. This is the measurement a pipeline uses
# to tune band geometry before trusting LSH at 100 TB.
@register(
    "minhash_estimate_q",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    m AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CASE WHEN x.minhash = y.minhash THEN 1 ELSE 0 END)
                    AS INT) AS n_match
        FROM cand c
        JOIN sig x ON x.doc_id = c.id_a
        JOIN sig y ON y.doc_id = c.id_b AND y.j = x.j
        GROUP BY c.id_a, c.id_b
    )
    SELECT m.id_a, m.id_b, m.n_match,
           ROUND(m.n_match / 16.0, 4) AS est_jaccard,
           ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                 / (len(ha.hs) + len(hb.hs)
                    - len(list_intersect(ha.hs, hb.hs))), 4) AS exact_jaccard
    FROM m
    JOIN sh ha ON ha.doc_id = m.id_a
    JOIN sh hb ON hb.doc_id = m.id_b
    """,
)
def minhash_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import (
        band_rows,
        candidate_pairs,
        shingle_band_sets,
    )

    d = Catalog(spark, sf_dir).documents
    # r15: ONE fused Arrow pass (shingle sets + band buckets + minhash
    # vector, each bit-identical to its standalone kernel) replaces the
    # three kernels this query ran (shingle_sets, band fold,
    # minhash_signatures) — every downstream consumer reads the one
    # pinned frame; bands/mins explode JVM-side.
    base = shingle_band_sets(
        d, "doc_id", "text", 5, 16, 4, with_minhash=True
    ).transform(pin)
    hs = base
    pairs = candidate_pairs(band_rows(base, "doc_id"), "doc_id")
    sigs = base.select(
        "doc_id", F.posexplode("mins").alias("j", "minhash")
    )
    sa = sigs.select(
        F.col("doc_id").alias("id_a"), "j", F.col("minhash").alias("m_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"), "j", F.col("minhash").alias("m_b")
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "j"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.when(F.col("m_a") == F.col("m_b"), 1).otherwise(0)
            )
            .cast("int")
            .alias("n_match")
        )
        .withColumn("est_jaccard", F.round(F.col("n_match") / 16.0, 4))
    )
    ha = hs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    hb = hs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        est.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "exact_jaccard", F.round(inter.cast("double") / union, 4)
        )
        .select("id_a", "id_b", "n_match", "est_jaccard", "exact_jaccard")
    )


# SimHash — 32-bit signature from token-hash bit votes (CTE shared with
# simhash_neardup's oracle).
_SQL_SIMHASH_CTE = f"""
    th AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS}, t -> {_SQL_POLY.format(s="t")})
                   AS hs
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_reduce(list_transform(range(0, 32), b ->
                   CASE WHEN list_reduce(list_transform(hs,
                                  h -> CASE WHEN (h >> b) & 1 = 1
                                            THEN 1 ELSE -1 END),
                              (x, y) -> x + y) > 0
                        THEN (1::BIGINT << b) ELSE 0 END),
                   (x, y) -> x + y) AS simhash
        FROM th
    )
"""


@register(
    "simhash",
    f"""
    WITH {_SQL_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sig
    """,
)
def simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return simhash_signatures(d, "doc_id", "text", bits=32)


# Banded-Hamming near-dup over SimHash (Manku et al. 2007): candidates
# share one of four 8-bit signature bands (pigeonhole → exact recall at
# Hamming ≤ 3), verified by popcount. The text-side twin of phash_neardup.
@register(
    "simhash_neardup_q",
    f"""
    WITH {_SQL_SIMHASH_CTE},
    b AS (SELECT doc_id, simhash,
                 CAST((simhash >> 0) & 255 AS INT) AS b0,
                 CAST((simhash >> 8) & 255 AS INT) AS b1,
                 CAST((simhash >> 16) & 255 AS INT) AS b2,
                 CAST((simhash >> 24) & 255 AS INT) AS b3
          FROM sig),
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.simhash AS sa, y.simhash AS sb
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand
    ) WHERE hamming <= 3
    """,
)
def simhash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import simhash_neardup

    d = Catalog(spark, sf_dir).documents
    return simhash_neardup(d, "doc_id", "text", bits=32, n_bands=4)


# Document fingerprint — polynomial hash of normalized text.
_SQL_NORM_TEXT = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_FINGERPRINT = _SQL_POLY.format(s=_SQL_NORM_TEXT)


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id, {_SQL_FINGERPRINT} AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


# Token counting — whitespace tokens + characters.
@register(
    "token_count",
    """
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '')) AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        whitespace_token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# Quality scoring — punctuation / stopword / length composite.
@register(
    "quality_score",
    f"""
    WITH t AS (
        SELECT doc_id, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(
             0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                     ELSE n_punct::DOUBLE / n END)
           + 0.3::DOUBLE * least(
                 (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                       ELSE len(list_filter(toks, x -> x IN
                            ('the','a','and','of','to','in','is','it')))::DOUBLE
                            / len(toks) END) * 5, 1.0::DOUBLE)
           + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
           AS DECIMAL(28,12)), 4)::DOUBLE AS quality
    FROM t
    """,
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", quality_score("text").alias("quality"))


# Language-ID heuristic — stopword-hit argmax, en>es>de>fr tie priority.
@register(
    "lang_id",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    s AS (
        SELECT doc_id,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", predict_lang("text").alias("lang_pred"))


# Exact k-NN — brute-force cosine top-5 for the first 10 query vectors;
# broadcast queries × corpus, ranked by rounded cosine (stable tiebreak).
@register(
    "knn_bruteforce",
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
        FROM scored
    ) t WHERE rn <= 5
    """,
    headline=True,
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return knn_bruteforce(
        corpus=e, queries=e.filter(F.col("vec_id") < 10), top_k=5
    )


# Approximate NN — sign-bucket LSH: search only within each vector's
# 4-bit sign bucket (deterministic fixed hyperplanes → oracle-checkable).
@register(
    "ann_bucketed",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(range(0, 4), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN power(2, d)::BIGINT ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) t WHERE rn <= 3
    """,
)
def ann_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ann_bucketed(e, bits=4, top_k=3)


# ---------------------------------------------------------------------------
# Extension surface, round-1 widening: embedding-cosine near-dup, grouping
# sets, approx-distinct (error-bound-checked), exact percentiles, and two
# TPC-H-style multi-join headline queries (join-order / broadcast showcase).
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.similarity import cosine_neardup


# Embedding-cosine near-duplicate pairs — the embedding-space member of the
# dedup family (SURVEY §7 phase 5): sign-bucket LSH candidates, rounded
# cosine ≥ 0.8, id_a < id_b.
@register(
    "embedding_cosine_neardup",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(range(0, 4), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN power(2, d)::BIGINT ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.5
    """,
)
def embedding_cosine_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return cosine_neardup(e, bits=4, threshold=0.5)


# GROUPING SETS / cube — multi-granularity aggregate in one pass
# (§2.4 extension; partial aggregation applies per grouping set).
@register(
    "cube_agg",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "gid",
            "sum_qty",
            "n",
        )
    )


# Approximate distinct-count (HyperLogLog++) checked against the exact
# count inside the query: the oracle-comparable output is the exact count
# plus a within-5% flag, so the approx machinery is exercised while the
# comparison stays deterministic across engines.
@register(
    "approx_distinct_check",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_nd"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_nd",
            (
                F.abs(F.col("__approx") - F.col("exact_nd"))
                <= 0.05 * F.col("exact_nd")
            ).alias("approx_ok"),
        )
    )


# Exact interpolated percentiles per group (§2.4 extension).
@register(
    "percentile_agg",
    """
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS p50,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.9)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated percentiles are a + f*(b - a) of 2-dp prices, so the
    true value is a multiple of 0.001 — but the two engines associate the
    interpolation differently, and a one-ulp difference at an exact .xx5
    cent boundary flips ROUND(..., 2) (observed at sf0.001). Casting to
    decimal(28,3) first recovers the exact 3-dp value on both engines, so
    the half-up round to cents is deterministic."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("percentile(l_extendedprice, 0.5)").cast("decimal(28,3)"), 2
        )
        .cast("double")
        .alias("p50"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.9)").cast("decimal(28,3)"), 2
        )
        .cast("double")
        .alias("p90"),
    )


# TPC-H Q3 (shipping priority): customer ⋈ orders ⋈ lineitem with
# selective filters on both sides, agg, global top-10. Scale notes: both
# date filters push to the parquet scans; customer (filtered) broadcasts;
# the orders⋈lineitem join shuffles on orderkey; top-10 is a
# TakeOrderedAndProject (no global sort materialization).
@register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            cat.orders.filter(
                F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            cat.lineitem.filter(
                F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's EXISTS is a LEFT SEMI join: the lineitem side is key+date
    projected before the shuffle, the semi join never duplicates order
    rows, and the priority agg combines map-side. Completes the TPC-H
    suite (q1 appears as q1_pricing_summary). The synthetic lineitem has
    no commit/receipt dates, so "late line item" is l_shipdate more than
    60 days after the order date — same correlated-EXISTS shape."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    return (
        cat.orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# TPC-H Q5 (local supplier volume): 6-table join; region/nation broadcast,
# the fact-side joins shuffle on their keys; one hash agg on n_name.
@register(
    "tpch_q5",
    """
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    headline=True,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.customer.join(
            cat.orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(cat.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_money(revenue).alias("revenue"))
    )


# IVF-flat ANN — the inverse-file scale path for similarity search:
# deterministic centroids (lowest-id vectors), nearest-centroid cells,
# in-cell exact top-k (nprobe=1).
from iniz_exporters_spark.operators.similarity import ivf_flat_topk


@register(
    "ivf_flat_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    assigned AS (
        SELECT vec_id, v, cidx AS cell FROM (
            SELECT e.vec_id, e.v, c.cidx,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                                DESC, c.cidx
                   ) AS rnk
            FROM e CROSS JOIN cents c
        ) t WHERE rnk = 1
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM assigned q JOIN assigned c
          ON q.cell = c.cell AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) t WHERE rn <= 3
    """,
)
def ivf_flat_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ivf_flat_topk(e, n_centroids=8, top_k=3)


# Token counting, BPE-ish: the GPT-2-style pre-tokenizer split (contraction
# suffixes | space-prefixed letter runs | digit runs | punctuation runs)
# counted per document alongside the whitespace count.
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


@register(
    "bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_ISH.replace("'", "''")}'))
               AS n_bpe_tokens,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '')) AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_ISH)).alias("n_bpe_tokens"),
        whitespace_token_count("text").alias("n_ws_tokens"),
    )


# Salted skew join — semantics-preserving hot-key spreading; the oracle is
# the plain join, proving salting changes the plan, not the result.
from iniz_exporters_spark.operators.skew import salted_join


@register(
    "salted_skew_join",
    """
    SELECT l_orderkey, l_partkey,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(8,4))), 2)
                AS DOUBLE) AS net,
           o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    """,
)
def salted_skew_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select(
        "l_orderkey",
        "l_partkey",
        # round in exact decimal space BEFORE the double cast: Spark's
        # round(double) goes through the shortest decimal repr while
        # DuckDB rounds the binary value, so per-row .xx5 products would
        # disagree by one cent (aggregate-then-round paths don't hit this)
        F.round(
            _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4)),
            2,
        ).cast("double").alias("net"),
    )
    o = cat.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return salted_join(li, o, on="l_orderkey", buckets=8, how="inner")


# ---------------------------------------------------------------------------
# End-to-end training-data cleaning pipeline: language filter → quality
# filter → exact dedup → near-dup removal → per-doc stats. One composed
# DataFrame plan (each stage is the already-oracle-checked operator), with
# the whole composition replayed in oracle CTEs — the "switch your corpus
# pipeline to this engine" demonstration.
# ---------------------------------------------------------------------------
@register(
    "pipeline_clean_corpus",
    f"""
    WITH t0 AS (
        SELECT doc_id, text, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, text,
               ROUND(CAST(
                 0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                         ELSE n_punct::DOUBLE / n END)
               + 0.3::DOUBLE * least(
                     (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                           ELSE len(list_filter(toks, x -> x IN
                                ('the','a','and','of','to','in','is','it')))::DOUBLE
                                / len(toks) END) * 5, 1.0::DOUBLE)
               + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
               AS DECIMAL(28,12)), 4)::DOUBLE
                   AS quality,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t0
    ),
    filtered AS (
        SELECT doc_id, text, quality FROM scored
        WHERE quality >= 0.5
          AND greatest(c_en, c_es, c_de, c_fr) > 0
          AND c_en = greatest(c_en, c_es, c_de, c_fr)
    ),
    exact AS (
        SELECT f.doc_id, f.text, f.quality
        FROM filtered f
        JOIN (SELECT text, MIN(doc_id) AS keep FROM filtered GROUP BY text) k
          ON f.text = k.text AND f.doc_id = k.keep
    ),
    {_sql_minhash_sigs(16, table="exact")},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    dropped AS (
        SELECT DISTINCT id_b FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
        WHERE ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                    / (len(ha.hs) + len(hb.hs)
                       - len(list_intersect(ha.hs, hb.hs))), 4) >= 0.7
    )
    SELECT e.doc_id, e.quality,
           len(list_filter(regexp_split_to_array(trim(e.text), '\\s+'),
                           x -> x <> '')) AS n_tokens
    FROM exact e LEFT JOIN dropped d ON e.doc_id = d.id_b
    WHERE d.id_b IS NULL
    """,
    headline=True,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.functions.text import text_stats

    d = Catalog(spark, sf_dir).documents
    # one Arrow pass for quality + language (bit-identical to the HOF
    # expression path — see text_stats parity test); round is applied
    # Spark-side so rounding semantics match the single-op queries.
    # r14-opt: carry_text=True — text rides the kernel's return leg
    # instead of being re-attached with a join(d, doc_id), which at
    # 100 TB shuffles the text payload (guide §8's attach rule; locally
    # AQE broadcast hid it).
    scored = text_stats(d, "doc_id", "text", carry_text=True).select(
        "doc_id",
        "text",
        # decimal-space round (see functions/text.quality_score): absorbs
        # cross-engine ulp noise at exact .xxxx5 boundaries before half-up
        F.round(F.col("quality_raw").cast("decimal(28,12)"), 4)
        .cast("double")
        .alias("quality"),
        "lang_pred",
    )
    # Pinned (r14-opt): dedup_exact reads its input TWICE (keep-agg +
    # semi-join), and this input's lineage is the Python kernel — the
    # whole scoring pass ran once per read.
    filtered = (
        scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        .select("doc_id", "text", "quality")
        .transform(pin)
    )
    # materialize the scored+deduped set ONCE: the near-dup stage reads it
    # from three branches (buckets + both verify-join sides) and the final
    # anti-join from a fourth — without pinning, Spark recomputes the
    # interpreted scoring expressions 4×. At cluster scale this is a
    # .persist(DISK_AND_MEMORY); localCheckpoint is its local[*] analogue.
    exact = dedup_exact(filtered, ["text"], "doc_id").transform(pin, eager=True)
    dropped = (
        neardup_pairs(exact, "doc_id", "text", threshold=0.7,
                      num_perm=16, rows_per_band=4)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return exact.join(dropped, on="doc_id", how="left_anti").select(
        "doc_id",
        "quality",
        whitespace_token_count("text").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# TPC-H relational breadth (adapted to the driver's reduced schemas: no
# partsupp/commitdate/shipmode, so Q2/Q4/Q12 take the documented stand-ins).
# Scale notes per query in the function docstrings.
# ---------------------------------------------------------------------------
@register(
    "tpch_q6",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                           * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg — all three predicates push to the parquet
    scan, a single partial-agg per split, one 1-row exchange. O(scan)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _money(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 8, 4))
        ).alias("revenue")
    )


@register(
    "tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume-shipping shape: fact joins two *roles* of the same
    dimension chain. supplier/nation broadcast (tiny); the disjunctive
    nation filter runs post-broadcast-join so only orders⋈lineitem and
    orders⋈customer shuffle. Year extraction stays in codegen."""
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(revenue).alias("revenue"))
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)
               AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-items: both filters (quarter, returnflag) push below
    their joins, nation broadcasts, and the top-20 runs as TakeOrdered
    (per-partition heap + driver merge — no global sort). Tiebreak on
    c_custkey keeps the LIMIT row-set deterministic."""
    cat = Catalog(spark, sf_dir)
    # round the exact decimal sum BEFORE the double cast (see salted_skew_join
    # note): customer-level sums land on .xx5 boundaries at sf0.01.
    revenue = F.round(
        F.sum(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))),
        2,
    ).cast("double")
    return (
        cat.customer.join(
            cat.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            cat.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14",
    """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 4)
               AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo share: month filter pushes to the lineitem scan (cuts the
    join probe ~70×), part broadcasts, both conditional sums ride one
    partial agg. Division happens once on exact decimal sums."""
    cat = Catalog(spark, sf_dir)
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / F.sum(disc_price).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    headline=True,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: the HAVING subquery is a lineitem-wide
    partial agg whose survivors (~0.3% of orders) LEFT-SEMI into orders
    *before* the customer join — the expensive joins see only qualifying
    rows. At 100 TB the semi-join side is small enough to broadcast; AQE
    converts it at runtime."""
    cat = Catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    return (
        cat.orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("_big_ok"), "left_semi"
        )
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive-predicate join: the OR spans both sides so it can't
    fully push down, but Catalyst still pushes the derived single-side
    envelopes (quantity ≤ 30, the brand IN-list) below the broadcast-hash
    join; the full disjunction evaluates in codegen post-join."""
    cat = Catalog(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4)))
            ).alias("revenue")
        )
    )


@register(
    "q4_exists_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape on the reduced schema (ships-late EXISTS instead of
    commit/receipt dates): EXISTS becomes a LEFT-SEMI hash join — lineitem
    never duplicates orders rows, and the quarter filter shrinks the probe
    side before the shuffle."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = cat.lineitem
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] >= o["o_orderdate"] + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Range / interval joins (operators/rangejoin.py): band predicates rewritten
# to equi-join shape so Spark picks hash joins instead of
# BroadcastNestedLoop / cartesian. The oracles use the naive inequality join
# (DuckDB handles that fine at sf0.01) — same declared semantics.
# ---------------------------------------------------------------------------
@register(
    "interval_join_events",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 6 HOUR
     AND c.ts < p.ts
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style interval join: each purchase paired with the same
    user's clicks in the preceding 6 h. interval_join buckets time into
    band-width granules so the plan is a shuffled HASH join on
    (user_id, bucket) — each side shuffles once (left ×2 rows), per-task
    probe work bounded by the micro-group, vs. the O(|P|·|C|)-per-user
    nested loop the raw inequality condition would plan. Survives 100 TB:
    shuffle is linear in input, AQE splits hot (user, bucket) groups."""
    from iniz_exporters_spark.operators.rangejoin import interval_join

    # two Catalog instances → independent scans (no self-join ambiguity)
    purchases = (
        Catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            "user_id",
        )
    )
    clicks = (
        Catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            "user_id",
        )
    )
    return interval_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_time="p_ts",
        right_time="c_ts",
        lower_seconds=6 * 3600,
    ).select("purchase_id", "click_id")


@register(
    "band_lookup_prices",
    """
    SELECT band, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty
    FROM lineitem
    JOIN (VALUES ('budget', 0.0, 20000.0),
                 ('mid', 20000.0, 60000.0),
                 ('premium', 60000.0, 110000.0)) b(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def band_lookup_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding a fact column against a keyless [lo, hi) dimension.
    band_lookup_join explodes each band into fixed-width granules and
    broadcast-HASH-joins the fact's granule key — the lineitem side streams
    through whole-stage codegen once, vs. BroadcastNestedLoopJoin re-testing
    every band per row. Granule count stays metadata-sized at any SF."""
    from iniz_exporters_spark.operators.rangejoin import band_lookup_join

    li = Catalog(spark, sf_dir).lineitem
    banded = band_lookup_join(
        li,
        "l_extendedprice",
        [("budget", 0.0, 20000.0), ("mid", 20000.0, 60000.0),
         ("premium", 60000.0, 110000.0)],
    )
    return banded.groupBy("band").agg(
        F.count("*").alias("n"),
        _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Scalar-subquery / correlated-aggregate / outer-join-distribution family
# (TPC-H Q13/Q15/Q17/Q22 shapes on the reduced schema). Correlated
# comparisons against an AVG are multiplied through by the group COUNT so
# both engines compare exact decimals — a double AVG at a boundary value
# could flip a row in one engine only.
# ---------------------------------------------------------------------------
@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 order-count distribution: the priority predicate lives in the
    outer-join ON clause (customers keep their row when every order is
    filtered away — COUNT(o_orderkey) then counts zero non-nulls). Two
    cascading aggs: the first shuffles on c_custkey, the second sees only
    |distinct counts| rows. At 100 TB, AQE coalesces the tiny second
    exchange."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders
    per_cust = (
        cat.customer.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15",
    """
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: per-supplier quarterly revenue, then keep rows
    equal to the global max. The 1-row max side broadcasts; revenue is
    compared as an exact decimal (ties keep every winner) and only
    presentation rounds. Revenue agg shuffles once on l_suppkey."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY l_partkey) pa
      ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sq
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity revenue: the correlated `l_quantity <
    0.2*AVG(l_quantity per part)` is computed as one per-part aggregate
    joined back to lineitem, with the comparison multiplied through by the
    count (5·q·cnt < sum) so it stays in exact decimals. The per-part agg
    and the probe share the l_partkey shuffle key; the Brand filter
    broadcasts."""
    cat = Catalog(spark, sf_dir)
    per_part = cat.lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("sq"),
        F.count("*").alias("cnt"),
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.part.filter(F.col("p_brand") == "Brand#23")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("pk") == F.col("l_partkey"))
        .filter(F.lit(5) * _dec(F.col("l_quantity")) * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q22",
    """
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer
    JOIN (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS n
          FROM customer WHERE c_acctbal > 0.0) g
      ON CAST(c_acctbal AS DECIMAL(18,4)) * n > s
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global-customer shape (nationkey stands in for the phone
    country code): rich customers = above-average balance (exact decimal,
    multiplied through by the count) with no URGENT orders (LEFT-ANTI
    against the filtered orders side — plain no-orders is vacuous on this
    dataset where every customer orders). The 1-row global aggregate
    broadcasts; the anti-join shuffles on custkey only."""
    cat = Catalog(spark, sf_dir)
    g = cat.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("s"), F.count("*").alias("n")
    )
    return (
        cat.customer.join(
            F.broadcast(g), _dec(F.col("c_acctbal")) * F.col("n") > F.col("s")
        )
        .join(
            cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec(F.col("c_acctbal"))), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup): Spark expands the
    sets into one pass over the scan — a single Expand node feeding one
    hash agg, not three scans. Decimal sums keep every grouping level
    order-independent."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(_dec(F.col("l_quantity"))), 2).cast("double").alias("sum_qty"),
    )


@register(
    "window_lag_gaps",
    """
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
    FROM events
    """,
)
def window_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap via LAG — the sessionization primitive.
    One shuffle on user_id, in-partition sort (ts, event_id tiebreak makes
    equal timestamps deterministic); the gap is an exact microsecond
    integer in both engines (no per-engine epoch truncation)."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )


# ---------------------------------------------------------------------------
# Conditional-share, multi-role-join, and only-one-qualifier shapes
# (TPC-H Q8/Q9/Q21 on the reduced schema) + JSON extraction over
# events.props.
# ---------------------------------------------------------------------------
@register(
    "tpch_q8",
    """
    SELECT year(o_orderdate) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                               THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END)
                      AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 4) AS mkt_share
    FROM (SELECT o_orderdate, n1.n_name AS supp_nation,
                 CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(8,4))) AS vol
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n2.n_regionkey
          WHERE r_name = 'ASIA') t
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share: NATION_1 suppliers' slice of revenue to ASIA
    customers, per year. Both nation roles + region broadcast; the
    numerator rides the same partial agg as the denominator (one shuffle
    on o_year, 6 groups). Share divides the two exact-decimal sums once,
    in double, at presentation."""
    cat = Catalog(spark, sf_dir)
    n_s = cat.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia_nk = (
        cat.nation.join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    vol = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(asia_nk), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, year(o_orderdate)
    """,
    headline=True,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 profit by supplier nation × order year (no ps_supplycost in the
    reduced schema, so profit = discounted revenue on '%red%' parts). The
    part LIKE filter broadcasts and prunes lineitem BEFORE the orders
    join — the one big shuffle probes only matching rows."""
    cat = Catalog(spark, sf_dir)
    red = cat.part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        cat.lineitem.join(
            F.broadcast(red), F.col("p_partkey") == F.col("l_partkey")
        )
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    _dec(F.col("l_extendedprice"))
                    * (1 - _dec(F.col("l_discount"), 8, 4))
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q21",
    """
    WITH lo AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey),
    per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
        FROM lo GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM lo
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE lo.is_late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 waiting-supplier shape: suppliers who were the ONLY late
    shipper in a multi-supplier finished order ("late" = shipped >100 days
    after ordering; the reduced schema has no commit/receipt dates). The
    classic EXISTS + NOT-EXISTS pair is restructured as one
    (orderkey, suppkey) aggregate reused by a per-order rollup — two
    shuffles total on the same key family, no correlated re-scans of
    lineitem. The rollup side re-uses the first agg's partitioning."""
    cat = Catalog(spark, sf_dir)
    lo = (
        cat.lineitem.join(
            cat.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 100 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        lo.join(per_order, "l_orderkey")
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: events.props holds a JSON object; pull
    an integer field and aggregate. get_json_object evaluates JVM-side
    inside codegen (no Python). At 100 TB, prefer from_json with an
    explicit schema once the shape is known — single parse, columnar
    output — but path extraction is the schemaless fallback shown here."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — min-cost supplier (reference has no TPC-H; this is §7
# extension breadth: correlated-MIN turned into one window over the
# candidate set). The testdata schema has no partsupp, so the
# part↔supplier cost relation is derived from lineitem: a pair's unit
# cost is its cheapest observed price-per-unit. Scale notes: the
# (part,supplier) agg and the per-part window MIN share the l_partkey
# key family, so AQE keeps it to two shuffles; supplier⨝nation⨝region
# is a broadcast chain (dims are tiny); the final TakeOrderedAndProject
# never materializes a global sort.
# ---------------------------------------------------------------------------
@register(
    "tpch_q2",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE)) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
        SELECT p_partkey, p_brand, s_suppkey, s_acctbal, s_name, n_name,
               unit_cost,
               MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
        FROM ps
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_type = 'STANDARD' AND p_size < 15 AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ROUND(unit_cost, 4) AS unit_cost
    FROM eligible
    WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost-supplier shape over the reduced schema (partsupp is
    derived from lineitem).  The correlated scalar subquery of the
    canonical Q2 is restructured as MIN() OVER (PARTITION BY part) on the
    already-filtered candidate set — one extra exchange instead of a
    second correlated scan of lineitem."""
    cat = Catalog(spark, sf_dir)
    ps = cat.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    eligible = (
        ps.join(
            F.broadcast(
                cat.part.filter(
                    (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .withColumn(
            "best_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        eligible.filter(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important-part value: global scalar subquery in
# HAVING. Scale notes: both the per-part agg and the grand total come
# from ONE filtered join (Spark reuses the cached filtered frame; the
# total is a 1-row broadcast), so lineitem is scanned once per agg with
# the nation filter pushed through the broadcast-join.
# ---------------------------------------------------------------------------
@register(
    "tpch_q11",
    """
    WITH filtered AS (
        SELECT l_partkey,
               CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4))) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_8')
    ),
    grouped AS (
        SELECT l_partkey, SUM(val) AS value_dec FROM filtered GROUP BY l_partkey
    ),
    total AS (SELECT SUM(value_dec) AS total_dec FROM grouped)
    SELECT l_partkey,
           ROUND(CAST(value_dec AS DOUBLE), 2) AS part_value
    FROM grouped, total
    WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.002
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important-value shape: per-part value filtered against a
    fraction of the grand total (HAVING with a global scalar subquery).
    The threshold comparison happens in exact-decimal space cast to
    double, so Spark and the oracle compare bit-identical numbers."""
    cat = Catalog(spark, sf_dir)
    val = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    filtered = (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(
            F.broadcast(cat.nation.filter(F.col("n_name").isin("NATION_3", "NATION_8"))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("l_partkey", val.alias("val"))
    )
    grouped = filtered.groupBy("l_partkey").agg(F.sum("val").alias("value_dec"))
    total = grouped.agg(F.sum("value_dec").alias("total_dec"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.002
        )
        .select(
            "l_partkey", F.round(F.col("value_dec").cast("double"), 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — late-shipment priority split. The reduced schema
# has no l_shipmode/commitdate/receiptdate, so "mode" is the return
# flag and "late" is shipped >60 days after ordering. Exercises the
# Q12 operator essence: join + CASE-bucketed conditional counts.
# Scale notes: orders is the bigger side here only at tiny SF; the
# o_orderkey equi-join is the one shuffle (AQE picks broadcast at small
# SF), and both CASE sums fold into a single map-side partial agg over
# 3 groups.
# ---------------------------------------------------------------------------
@register(
    "tpch_q12",
    """
    SELECT l_returnflag AS ship_class,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 priority-split shape (no shipmode column → returnflag buckets,
    no receipt/commit dates → late = shipped >60 days after ordering).
    CASE-bucketed counts aggregate map-side; the date range pushes to the
    lineitem scan."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — suppliers per part profile: COUNT(DISTINCT) plus a
# NOT-IN exclusion subquery. Scale notes: the exclusion list (suppliers
# with negative balance) is dim-sized → broadcast LEFT ANTI, never a
# shuffle; count-distinct over (brand,type,size) runs as a two-phase
# partial-distinct agg (Spark expands to partial dedup then count),
# shuffling only the distinct (group, suppkey) pairs.
# ---------------------------------------------------------------------------
@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count shape: NOT IN over a non-nullable key becomes a
    broadcast left-anti join; COUNT(DISTINCT) stays a built-in two-phase
    agg (no collect, no UDF)."""
    cat = Catalog(spark, sf_dir)
    bad = cat.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        cat.lineitem.join(
            F.broadcast(
                cat.part.filter(
                    (F.col("p_brand") != "Brand#13")
                    & (F.col("p_type") != "PROMO")
                    & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — heavy suppliers of promo parts: nested correlated
# aggregate (pair quantity vs part total) driving a semi-join back to
# supplier. Scale notes: the pair agg and the per-part window total
# share the l_partkey shuffle key; the surviving supplier-key set is
# tiny → broadcast semi-join against supplier⨝nation, so the dimension
# row never rides a shuffle.
# ---------------------------------------------------------------------------
@register(
    "tpch_q20",
    """
    WITH promo AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS pair_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    with_total AS (
        SELECT l_suppkey, CAST(pair_qty AS DOUBLE) AS pair_qty,
               CAST(SUM(pair_qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
                   AS part_qty
        FROM promo
    ),
    heavy AS (
        SELECT DISTINCT l_suppkey FROM with_total
        WHERE pair_qty > 0.3 * part_qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 excess-quantity shape (no partsupp.availqty → a pair is
    "heavy" when it shipped >30% of its part's promo volume). The
    canonical nested correlated subqueries become one agg + one window
    over the same key, then a LEFT SEMI join back to the dimension."""
    cat = Catalog(spark, sf_dir)
    promo = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(cat.part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("pair_qty_dec"))
    )
    with_total = promo.select(
        "l_suppkey",
        F.col("pair_qty_dec").cast("double").alias("pair_qty"),
        F.sum("pair_qty_dec")
        .over(Window.partitionBy("l_partkey"))
        .cast("double")
        .alias("part_qty"),
    )
    heavy = (
        with_total.filter(F.col("pair_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        cat.supplier.join(
            F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup with AllPairs prefix filtering — the exact-recall
# counterpart to the probabilistic MinHash-LSH `neardup_pairs`. See
# operators/dedup.py::ngram_jaccard_pairs for the scale analysis.
# ---------------------------------------------------------------------------
@register(
    "ngram_jaccard_pairs",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS}, t -> {_SQL_POLY.format(s="t")}) AS th
        FROM documents
    ),
    gs AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(range(1, len(th) - 1),
                   i -> ((th[i] * 1000003 + th[i+1]) % 1000000007 * 1000003
                         + th[i+2]) % 1000000007))) AS gs
        FROM th WHERE len(th) >= 3
    ),
    pref AS (
        SELECT doc_id,
               unnest(gs[1 : len(gs) - ((3 * len(gs) + 4) // 5) + 1]) AS ph
        FROM gs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pref a JOIN pref b ON a.ph = b.ph AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
               len(list_intersect(ga.gs, gb.gs)) AS inter,
               len(ga.gs) + len(gb.gs)
                   - len(list_intersect(ga.gs, gb.gs)) AS uni
        FROM cand
        JOIN gs ga ON ga.doc_id = id_a
        JOIN gs gb ON gb.doc_id = id_b
    )
    SELECT id_a, id_b, ROUND(inter::DOUBLE / uni, 4) AS jaccard
    FROM scored WHERE inter::DOUBLE / uni >= 0.6
    """,
    headline=True,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# Window-function breadth: rank-family (NTILE / PERCENT_RANK / CUME_DIST)
# and frame-bounded FIRST/LAST over one shared partition spec. Scale
# notes: all five functions share a single (c_mktsegment ORDER BY
# c_acctbal) sort — Catalyst computes them in ONE Window exec after ONE
# exchange on the partition key; per-partition state is O(1) for the
# rank family and the running frame.
# ---------------------------------------------------------------------------
@register(
    "window_rank_family",
    """
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS acct_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest_cust,
           LAST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows; ORDER BY includes c_custkey so ties rank
    identically in both engines. LAST_VALUE needs the explicit unbounded
    frame (the default frame stops at CURRENT ROW)."""
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("acct_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_cust"),
        F.last("c_custkey").over(w_full).alias("richest_cust"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregate family: corr / covar / stddev / variance / median.
# All are one-pass partial-aggregatable (sum, sum-of-squares, cross-sum
# moments combine associatively), so Spark computes them map-side partial +
# one shuffle on the group key — same plan shape as any hash agg. Values
# normalized ([-1,1] corr, small-magnitude inputs) and rounded to 6 dp so
# fp summation-order noise (~1e-13) can never reach the compared value.
# ---------------------------------------------------------------------------
@register(
    "stats_agg_family",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 8) AS covar_qty_disc,
           ROUND(stddev_samp(l_quantity), 6) AS stddev_qty,
           ROUND(var_samp(l_discount), 8) AS var_disc,
           median(l_quantity) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias("covar_qty_disc"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.median("l_quantity").alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (FILTER-clause semantics): per-priority order
# counts and money split by status in ONE grouped pass — no self-join, no
# second scan. Spark expresses FILTER as when()-guarded aggregates, which
# Catalyst folds into the same hash-agg buffers.
# ---------------------------------------------------------------------------
@register(
    "conditional_agg",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                      FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE)
               AS finished_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(is_f, 1)).alias("n_finished"),
        F.count(F.when(is_o, 1)).alias("n_open"),
        F.round(
            F.sum(F.when(is_f, _dec(F.col("o_totalprice")))).cast("double"), 2
        ).alias("finished_value"),
    )


# ---------------------------------------------------------------------------
# E-family set operators: INTERSECT / EXCEPT (distinct semantics) between
# two yearly customer cohorts, tagged and unioned into one result. Each set
# op is a distinct-aggregate shuffle on the full row; at scale both cohorts
# hash-partition on c_custkey so the op is a co-partitioned merge.
# ---------------------------------------------------------------------------
@register(
    "intersect_except_custs",
    """
    SELECT 'both' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    """,
)
def intersect_except_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y96.intersect(y97).select(F.lit("both").alias("cohort"), "o_custkey")
    # subtract == EXCEPT DISTINCT; exceptAll is bag semantics and would leave
    # surviving duplicates of keys that also appear on the right.
    only = y96.subtract(y97).select(
        F.lit("only_1996").alias("cohort"), "o_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# String-distance join: Levenshtein over nation-name pairs. The dimension
# is tiny so the self-join broadcasts; the distance function is JVM
# codegen'd (no UDF). The < tiebreak keeps each unordered pair once.
# ---------------------------------------------------------------------------
@register(
    "levenshtein_nations",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
)
def levenshtein_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 6)
    )


# ---------------------------------------------------------------------------
# Value-range window frame: 30-day trailing spend per customer. RANGE
# frames bound the frame by ORDER-BY value, not row count — Spark needs a
# numeric ordering column, so the date goes through epoch seconds. One
# exchange on o_custkey + one sort; the frame sum is maintained
# incrementally (O(1) per row) in decimal space on both engines.
# ---------------------------------------------------------------------------
@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double"), 2
        ).alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------------------
# R-family reshape: UNPIVOT (wide → long melt). Narrow transform, no
# shuffle at all — each input row emits k metric rows in place, so the
# plan is scan → generate, fully pipelined.
# ---------------------------------------------------------------------------
@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
    FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Date/time function breadth over the events stream: truncation, field
# extraction, day arithmetic. All JVM intrinsics; the group-by key is
# derived (year, month) so partial aggregation still applies.
# ---------------------------------------------------------------------------
@register(
    "datetime_breadth",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           year(ts) AS yr, quarter(ts) AS qtr, month(ts) AS mon,
           day(ts) AS dom,
           count(*) AS n_events,
           min(hour(ts)) AS first_hour,
           max(hour(ts)) AS last_hour,
           CAST(ROUND(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY ALL
    """,
)
def datetime_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.year("ts").alias("yr"),
        F.quarter("ts").alias("qtr"),
        F.month("ts").alias("mon"),
        F.dayofmonth("ts").alias("dom"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.hour("ts")).alias("first_hour"),
        F.max(F.hour("ts")).alias("last_hour"),
        F.round(F.sum(_dec(F.col("value"))).cast("double"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Regex extraction over document text: leading-word histogram. The
# extraction is a codegen'd JVM regex (no Python); both engines return ''
# on no-match so empty texts land in one deterministic bucket.
# ---------------------------------------------------------------------------
@register(
    "regexp_first_word",
    """
    SELECT lower(regexp_extract(text, '^([A-Za-z]+)', 1)) AS first_word,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lower(regexp_extract(text, '^([A-Za-z]+)', 1))
    """,
)
def regexp_first_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.groupBy(
        F.lower(F.regexp_extract("text", r"^([A-Za-z]+)", 1)).alias("first_word")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


from iniz_exporters_spark.functions.text import poly_hash  # noqa: E402


# ---------------------------------------------------------------------------
# MIN_BY / MAX_BY aggregates: per-nation richest/poorest customer in ONE
# grouped pass — no window, no self-join, no sort. The comparator packs
# (acctbal, custkey) into one exact DECIMAL so ties break identically in
# both engines (DuckDB's arg_max cannot order by a struct). At scale this
# is a plain partial-aggregatable hash agg: each map task keeps one
# candidate per group, only candidates shuffle.
# ---------------------------------------------------------------------------
@register(
    "minmax_by_agg",
    """
    SELECT n.n_name AS nation,
           arg_max(c.c_name,
                   CAST(c.c_acctbal AS DECIMAL(18,2)) * 10000000 + c.c_custkey)
               AS richest_cust,
           arg_min(c.c_name,
                   CAST(c.c_acctbal AS DECIMAL(18,2)) * 10000000 + c.c_custkey)
               AS poorest_cust,
           max(c.c_acctbal) AS max_bal,
           min(c.c_acctbal) AS min_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def minmax_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    packed = _dec(F.col("c_acctbal"), 18, 2) * 10000000 + F.col("c_custkey")
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max_by("c_name", packed).alias("richest_cust"),
            F.min_by("c_name", packed).alias("poorest_cust"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Null-handling scalar family: NULLIF / COALESCE / GREATEST / LEAST.
# Row-level, zero-shuffle, fully codegen'd; values pass through unchanged
# (no arithmetic) so cross-engine equality is exact.
# ---------------------------------------------------------------------------
@register(
    "null_handling_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_nn,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
           greatest(l_discount, l_tax) AS hi_rate,
           least(l_discount, l_tax) AS lo_rate,
           CASE WHEN l_discount > l_tax THEN 'disc' ELSE 'tax' END AS winner
    FROM lineitem
    """,
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_nn = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_nn.alias("disc_nn"),
        F.coalesce(disc_nn, F.lit(-1.0)).alias("disc_filled"),
        F.greatest("l_discount", "l_tax").alias("hi_rate"),
        F.least("l_discount", "l_tax").alias("lo_rate"),
        F.when(F.col("l_discount") > F.col("l_tax"), "disc")
        .otherwise("tax")
        .alias("winner"),
    )


# ---------------------------------------------------------------------------
# String-function breadth: SPLIT_PART / LPAD / REVERSE / TRANSLATE /
# SUBSTR / INITCAP-equivalent casing. Same ANSI names on both engines;
# row-level codegen, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "string_funcs_breadth",
    """
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_head,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
           substr(p_name, 1, 8) AS name_prefix,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len
    FROM part
    """,
)
def string_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_vowels"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.length(F.col("p_name")).alias("name_len"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram binning: bucket = floor(x / width), capped to a
# top bucket. Both engines evaluate the same IEEE-double division, so
# bucket assignment is bit-identical. One partial-aggregatable group-by;
# the bucket count is bounded, so the reduce side is tiny at any scale.
# ---------------------------------------------------------------------------
@register(
    "histogram_bins",
    """
    SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
           count(*) AS n_orders,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS bucket_value
    FROM orders
    GROUP BY least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19)
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"), F.lit(19)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec(F.col("o_totalprice"))).cast("double"), 2).alias(
            "bucket_value"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling: keep rows whose poly_hash(key) mod 20 == 0
# (a reproducible ~5% Bernoulli sample keyed on content, not RNG state).
# This is how a 100 TB pipeline takes a stable sample across reruns and
# engines: the predicate pushes to the scan, no shuffle until the
# aggregate, and the same rows are chosen on every cluster size.
# ---------------------------------------------------------------------------
@register(
    "sample_poly_hash",
    f"""
    SELECT c_nationkey,
           count(*) AS n_sampled,
           CAST(ROUND(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sampled_bal
    FROM customer
    WHERE {_SQL_POLY.format(s="c_name")} % 20 = 0
    GROUP BY c_nationkey
    """,
)
def sample_poly_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return (
        c.filter(poly_hash("c_name") % 20 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum(_dec(F.col("c_acctbal"))).cast("double"), 2).alias(
                "sampled_bal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dynamic pivot (R2/R3 at registry scale): languages discovered from data
# become columns. Spark runs a distinct-collection job first (the
# "discover the schema from the data" step the locations exporter needs),
# then one pivot agg. The oracle pins the same columns statically.
# ---------------------------------------------------------------------------
@register(
    "pivot_dynamic_langs",
    """
    SELECT source,
           count(*) FILTER (WHERE lang = 'de') AS de,
           count(*) FILTER (WHERE lang = 'en') AS en,
           count(*) FILTER (WHERE lang = 'es') AS es,
           count(*) FILTER (WHERE lang = 'fr') AS fr,
           count(*) FILTER (WHERE lang = 'zh') AS zh
    FROM documents
    GROUP BY source
    """,
)
def pivot_dynamic_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # no value list → Spark discovers pivot columns from the data
    out = d.groupBy("source").pivot("lang").agg(F.count(F.lit(1)))
    return out.fillna(0, subset=[c for c in out.columns if c != "source"])


# ---------------------------------------------------------------------------
# Array-function breadth over embeddings: length, elementwise square, a
# sequential fold for the L2 norm, array min/max. Elements are cast to
# double BEFORE any arithmetic (float math rounds differently per engine)
# and both engines fold left-to-right, so the sum is order-identical;
# ROUND(.,4) absorbs the last-bit difference of sqrt.
# ---------------------------------------------------------------------------
@register(
    "array_norm_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(sqrt(list_reduce(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b)), 4) AS l2_norm,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS min_elem
    FROM embeddings
    """,
)
def array_norm_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 4
        ).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_elem"),
    )


# ---------------------------------------------------------------------------
# Changelog compaction: keep only the LATEST record per key (the upsert /
# SCD-1 pattern every ingest pipeline needs). row_number over a
# (key DESC-ts) sort with a unique tiebreaker, filtered to 1 — Spark plans
# one exchange on user_id + per-partition sort; with AQE the filter
# collapses to a top-1-per-key aggregation shape. At 100 TB the same plan
# holds: state per key is O(1), no driver involvement.
# ---------------------------------------------------------------------------
@register(
    "latest_per_key",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit LEFT SEMI join: customers that placed at least one high-value
# order. Semi joins ship only the probe side's keys — no payload from the
# right relation crosses the shuffle, and the output never duplicates.
# ---------------------------------------------------------------------------
@register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return cat.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey")

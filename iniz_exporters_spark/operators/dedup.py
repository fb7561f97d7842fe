"""Deduplication operators for the training-data pipeline (SURVEY §7 phase 5).

All four families, each expressed as native Spark plans (no Python UDFs):

  * exact          — hash-groupBy keep-first
  * MinHash + LSH  — shingle → k-permutation signatures → banded bucket join
  * SimHash        — bitwise majority vote over token hashes
  * n-gram Jaccard — exact similarity on LSH candidate pairs

Scale design: signatures are computed per-row with array expressions (NO
explode, NO shuffle — a doc's shingle array never leaves its task); the only
shuffles are the band-bucket groupBy (tiny rows: id + band + bucket) and the
candidate-pair join. That is the textbook MinHash-LSH dataflow: candidate
generation cost is O(near-duplicate pairs), never O(n²).

Hashing is a polynomial fold (functions/text.py) rather than xx/murmur so
the DuckDB oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from iniz_exporters_spark.functions.text import MOD, char_shingles, poly_hash

#: MinHash permutation parameters h_j(x) = (A_j·x + B_j) mod MOD with
#: A_j = 1000003·j + 1 (nonzero mod the prime), B_j = 7919·j + 12345.
PERM_A_FACTOR = 1000003
PERM_B_FACTOR = 7919
PERM_B_OFFSET = 12345


def shingle_hash_set(text: Column | str, k: int = 5) -> Column:
    """Distinct polynomial hashes of the text's k-char shingles."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(char_shingles(c, k), lambda s: poly_hash(s))
    )


def minhash_value(hashes: Column, j: Column | int) -> Column:
    """min over the hash set of the j-th permutation."""
    jj = F.lit(j) if isinstance(j, int) else j
    a = jj * PERM_A_FACTOR + 1
    b = jj * PERM_B_FACTOR + PERM_B_OFFSET
    return F.array_min(F.transform(hashes, lambda h: (a * h + b) % MOD))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 8, k: int = 5
) -> DataFrame:
    """(id, j, minhash) rows — narrow per-row compute, zero shuffles."""
    return (
        df.select(
            F.col(id_col), shingle_hash_set(text_col, k).alias("__hs")
        )
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("j"),
            F.col("__hs"),
        )
        .select(
            id_col,
            "j",
            minhash_value(F.col("__hs"), F.col("j")).alias("minhash"),
        )
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    rows_per_band: int = 2,
    k: int = 5,
) -> DataFrame:
    """(id, band, bucket) — one row per band; bucket is the polynomial fold
    of the band's signature values. Docs sharing any (band, bucket) are
    near-duplicate candidates."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, k)
    return (
        sigs.withColumn("band", F.expr(f"j div {rows_per_band}"))
        .groupBy(id_col, "band")
        .agg(
            # fold in j-order: sort_array of (j, minhash) structs
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("j", "minhash"))),
                F.lit(0).cast("long"),
                lambda acc, x: (acc * 31 + x["minhash"]) % MOD,
            ).alias("bucket")
        )
    )


def candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band-bucket."""
    a = buckets.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 8,
    rows_per_band: int = 2,
    k: int = 5,
) -> DataFrame:
    """(id_a, id_b, jaccard) for LSH candidate pairs whose exact shingle-set
    Jaccard passes the threshold. Joins the (small) hash-set projection back
    onto the candidate pairs only — exact verification cost is proportional
    to candidates, not to n²."""
    hs = df.select(
        F.col(id_col), shingle_hash_set(text_col, k).alias("hs")
    )
    pairs = candidate_pairs(
        lsh_buckets(df, id_col, text_col, num_perm, rows_per_band, k), id_col
    )
    ha = hs.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
    hb = hs.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        pairs.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) — SimHash over the text's token-hash multiset: bit b of
    the signature is the sign of the sum of ±1 votes from each token hash's
    b-th bit. Whole computation is one per-row SQL expression (no shuffle).

    Written as a SQL expr because pyspark's shiftright/shiftleft wrappers
    only take literal shift amounts, while the SQL functions accept columns.
    """
    from iniz_exporters_spark.functions.text import tokens

    th = df.select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: poly_hash(t)).alias("__th"),
    )
    sim = f"""
      aggregate(
        transform(sequence(0, {bits - 1}), b ->
          CASE WHEN aggregate(
                 transform(__th, h ->
                   CASE WHEN shiftright(h, b) % 2 = 1 THEN 1L ELSE -1L END),
                 0L, (x, y) -> x + y) > 0
               THEN shiftleft(1L, b) ELSE 0L END),
        0L, (x, y) -> x + y)
    """
    return th.select(id_col, F.expr(sim).alias("simhash"))


def dedup_exact(df: DataFrame, cols: list[str], order_col: str) -> DataFrame:
    """Exact dedup: keep the min-``order_col`` row per distinct ``cols``.

    At 100 TB: one shuffle on the (hashed) dedup key; the min-reduce is
    map-side partial so duplicate payloads never cross the network twice.
    """
    keep = (
        df.groupBy(*cols).agg(F.min(order_col).alias(order_col))
    )
    return df.join(keep, on=[*cols, order_col], how="left_semi")

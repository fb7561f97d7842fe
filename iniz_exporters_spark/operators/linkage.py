"""Entity resolution / record linkage: blocked candidate generation +
edit-distance verification.

The classic two-phase shape (Fellegi-Sunter blocking, as surveyed in
Christen, "Data Matching", 2012): a cheap deterministic BLOCKING KEY
partitions the corpus so candidate pairs are generated only within blocks
(cost ∝ Σ block² instead of n²), then an exact string-similarity VERIFY
(Levenshtein here — built into both Spark and DuckDB, so the oracle can
replay it) scores only those candidates.

Scale notes (100 TB): the self-join shuffles on the blocking key only —
record payloads cross the wire once, partitioned by block. Block-size skew
is the operator's failure mode; `max_block` guards it by dropping
oversized blocks loudly (the standard practice — an over-populated block
means the key is under-discriminating, and its pairs are near-useless
anyway). No all-pairs stage exists at any scale.

Reference parity: the reference has no record linkage (its joins are
exact-key); this is part of the mandated training-data-pipeline extension
surface (SURVEY §7 phase 5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_key,
    max_lev: int = 4,
    min_sim: float = 0.5,
    max_block: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, lev, sim) — within-block pairs whose Levenshtein
    distance is ≤ `max_lev` AND whose normalized similarity
    1 - lev/max(len_a, len_b) is ≥ `min_sim`, with id_a < id_b.

    `block_key` is a Column expression over the input row (e.g. a token +
    first-char composite). `sim` is rounded to 4 dp for cross-engine hash
    stability.
    """
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        block_key.alias("bk"),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        block_key.alias("bk"),
    )
    # Skew guard: drop blocks whose size would make the within-block
    # quadratic stage pathological. Counting first costs one extra
    # key-only aggregation; the join that follows shuffles payloads once.
    sizes = left.groupBy("bk").agg(F.count(F.lit(1)).alias("_bsz"))
    left = left.join(F.broadcast(sizes.filter(F.col("_bsz") <= max_block)), "bk")
    lev = F.levenshtein("name_a", "name_b")
    sim = F.round(
        1.0
        - lev.cast("double")
        / F.greatest(F.length("name_a"), F.length("name_b")).cast("double"),
        4,
    )
    return (
        left.join(right, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("lev", lev.cast("long"))
        .withColumn("sim", sim)
        .filter((F.col("lev") <= max_lev) & (F.col("sim") >= min_sim))
        .select("id_a", "id_b", "lev", "sim")
        .dropDuplicates(["id_a", "id_b"])
    )

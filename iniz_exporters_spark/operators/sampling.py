"""Deterministic mixture sampling — per-stratum rates for training-data
mixing (up-/down-weighting sources or languages to hit a target
distribution).

Content-keyed gating (poly_hash of a stable key, not RNG) means the SAME
rows are kept on every rerun, at any cluster size, on any engine — so a
mixture is reproducible and its complement is addressable (the dropped
rows are exactly the other hash residues). The gate is a pure Catalyst
predicate: it pushes into the scan where the source format allows and
never shuffles; thresholds are integerized Python-side so no float
arithmetic reaches the comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from iniz_exporters_spark.functions.text import poly_hash


def mixture_gate(
    strata_col: str,
    key: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 10_000,
) -> Column:
    """Boolean keep-gate: hash(key) % denom < round(rate(stratum)·denom)."""
    thresholds = {s: round(r * denom) for s, r in rates.items()}
    thr: Column = F.lit(round(default_rate * denom))
    for s in sorted(thresholds):
        thr = F.when(F.col(strata_col) == s, F.lit(thresholds[s])).otherwise(
            thr
        )
    return (poly_hash(key) % denom) < thr


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 10_000,
) -> DataFrame:
    """Rows surviving the per-stratum deterministic gate."""
    return df.filter(
        mixture_gate(
            strata_col,
            F.col(key_col).cast("string"),
            rates,
            default_rate,
            denom,
        )
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    denom: int = 100,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test-style split on a stable key.

    Assigns each row a split label by hash residue: with fractions
    {train: .8, val: .1, test: .1} the key's ``poly_hash % denom`` lands in
    [0,80) → train, [80,90) → val, [90,100) → test. Content-keyed like
    ``mixture_gate``: the same row lands in the same split on any engine,
    any partitioning, any rerun — and adding data never moves existing rows
    between splits. Pure Catalyst predicate; no shuffle, no RNG.

    ``fractions`` are assigned in sorted-label order for determinism; they
    must sum to ≤ 1 (any remainder falls into the LAST sorted label).
    """
    total = sum(fractions.values())
    if not fractions or total > 1 + 1e-9:
        raise ValueError(
            f"hash_split fractions must be non-empty and sum to <= 1, "
            f"got {total}"
        )
    labels = sorted(fractions)
    bucket = poly_hash(F.col(key_col).cast("string")) % denom
    hi = 0
    expr = None
    for lab in labels:
        hi += round(fractions[lab] * denom)
        cond = bucket < hi
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    expr = expr.otherwise(labels[-1])
    return df.withColumn(split_col, expr)


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, drawn uniformly and
    deterministically: rank rows within each group by (poly_hash(key), key)
    and keep the k smallest.

    The hash order is a uniform random permutation of each group keyed by
    content — the distributed stand-in for a per-group reservoir, with the
    reservoir's sequential state replaced by one window shuffle on the
    group key. Groups parallelize across partitions; a skewed group costs
    one partition's sort of its own rows, never a global sort.
    """
    h = poly_hash(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn(rn_col, F.row_number().over(w)).filter(
        F.col(rn_col) <= k
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u ∈ (0,1] from the HASH of its key (not
    an RNG) and gets priority ln(u)/w; the k LARGEST priorities win, so
    inclusion probability scales with weight yet every engine/partitioning
    draws the same sample. Priorities are rounded in decimal space with a
    key tiebreak, so the top-k frontier is engine-stable.

    Plan shape: per-row expression + global top-k — Catalyst plans the
    ordered limit as TakeOrderedAndProject (per-partition heaps, no global
    sort materialization).
    """
    u = (poly_hash(F.col(key_col).cast("string")) % 999983 + 1) / 999984.0
    prio = F.round(
        (F.log(u) / F.col(weight_col)).cast("decimal(28,12)"), round_dp
    ).cast("double")
    return (
        df.withColumn("priority", prio)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def shuffle_key(id_col: Column | str, seed: str = "42") -> Column:
    """Deterministic global-shuffle key: md5(seed || "-" || id).

    Training-data pipelines need the corpus in a pseudo-random order that is
    reproducible across reruns, cluster sizes, and engines — RNG-seeded
    ``ORDER BY random()`` is partition-layout-dependent, a content-keyed
    hash is not. At 100 TB the full shuffle is
    ``repartitionByRange(shuffle_key).sortWithinPartitions(shuffle_key)``:
    a range exchange plus partition-local sorts, never a single global sort
    task; changing ``seed`` reshuffles without touching the data.

    NULL-propagating like the DuckDB equivalent ``md5(seed || '-' || id)``:
    a NULL id yields a NULL key rather than collapsing all NULL-id rows
    onto md5(seed).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(seed), F.lit("-"), c.cast("string")))


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "42", partitions: int | None = None
) -> DataFrame:
    """The corpus in reproducible pseudo-random order: range-partitioned and
    locally sorted by ``shuffle_key`` (scale shape documented there)."""
    if "__skey" in df.columns:
        raise ValueError(
            "deterministic_shuffle: input already has a '__skey' column; "
            "rename it before shuffling"
        )
    keyed = df.withColumn("__skey", shuffle_key(id_col, seed))
    parts = keyed.repartitionByRange(
        *( [partitions, "__skey"] if partitions else ["__skey"] )
    )
    return parts.sortWithinPartitions("__skey").drop("__skey")


def stratified_allocation(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_total: int,
) -> DataFrame:
    """(stratum, n_stratum, n_alloc) — exact proportional sample
    allocation by the largest-remainder (Hamilton) method, in pure
    integer arithmetic: base_s = (n·N_s) // N, and the n - Σbase leftover
    seats go to the strata with the largest remainders (n·N_s) mod N
    (ties broken by stratum name). No floating point anywhere, so the
    allocation is bit-stable across engines, partitionings, and reruns —
    the property a reproducible train/eval split needs.

    Scale: one count aggregation over the data; everything after runs on
    the STRATUM table (cardinality of the stratification key — metadata).
    The window that ranks remainders is over that metadata table only.
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    tot = counts.agg(F.sum("n_stratum").alias("N"))
    based = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_prod", F.lit(n_total) * F.col("n_stratum"))
        # `div` = exact long division (no float detour at any magnitude)
        .withColumn("base", F.expr("_prod div N"))
        .withColumn("rem", F.col("_prod") % F.col("N"))
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
    wsum = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        based.withColumn("rk", F.row_number().over(w))
        .withColumn("extras", F.lit(n_total) - F.sum("base").over(wsum))
        .select(
            "stratum",
            "n_stratum",
            (F.col("base") + (F.col("rk") <= F.col("extras")).cast("long")).alias(
                "n_alloc"
            ),
        )
    )


def stratified_take(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_total: int,
) -> DataFrame:
    """The allocated sample itself: within each stratum, rows ranked by
    (poly_hash(key), key) — content-keyed, layout-independent — and the
    first n_alloc taken. Returns the sampled rows plus their stratum."""
    alloc = stratified_allocation(df, stratum_col, key_col, n_total)
    w = Window.partitionBy(stratum_col).orderBy(
        poly_hash(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    ranked = df.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.join(
            F.broadcast(alloc),
            ranked[stratum_col] == alloc["stratum"],
        )
        .filter(F.col("_rn") <= F.col("n_alloc"))
        .drop("_rn", "stratum")
    )

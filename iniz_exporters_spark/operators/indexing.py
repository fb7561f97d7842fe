"""Distributed dense indexing and deterministic negative sampling.

``global_index`` solves the classic scale trap behind ``ROW_NUMBER() OVER
(ORDER BY …)``: a single global window collapses the whole table into ONE
task. Instead we range-partition on the order key, number rows within each
partition in parallel, and add per-partition offsets computed from a
partition-count pass (driver-side, one row per partition — metadata
scale). The range boundaries Spark samples are not themselves
deterministic, but the OUTPUT is: rank of a row = its position in the
total order of a unique key, independent of where the boundaries fell.

``negative_sample_pairs`` builds contrastive-training negatives on top:
every anchor row draws k pseudo-random partners from the rest of the
corpus via a hash of (rank, draw, seed) — content-keyed like
operators/sampling.py, so the same pairs come out on any engine, any
partitioning, any rerun, and the DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.pinning import pin
from iniz_exporters_spark.session import metadata_df


def _ranked_with_total(df: DataFrame, sort_cols, idx_col: str):
    """(ranked frame, total row count): 1-based global rank over the
    composite total order ``sort_cols`` (Column expressions, .desc()
    allowed) without a single-partition window. The order must be total
    (include a unique tiebreak column). Three jobs: materialize the
    range-partitioned frame (localCheckpoint pins the partitioning so the
    count pass and the output pass see the SAME layout), collect
    per-partition counts (one row per partition — metadata scale), then
    number within partitions in parallel and add broadcast offsets."""
    sort_cols = list(sort_cols)
    pinned = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin, eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in pinned.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off_df = metadata_df(spark, offsets, "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    ranked = (
        pinned.join(F.broadcast(off_df), "__pid")
        .withColumn(
            idx_col, (F.row_number().over(w) + F.col("__offset")).cast("long")
        )
        .drop("__pid", "__offset")
    )
    return ranked, acc


def global_index(
    df: DataFrame, order_col, idx_col: str = "idx"
) -> DataFrame:
    """Add a 1-based dense index in ``order_col`` order without a
    single-partition window. ``order_col`` is a column name or a list of
    names/Column expressions; the composite order must be total."""
    if isinstance(order_col, (list, tuple)):
        cols = [F.col(c) if isinstance(c, str) else c for c in order_col]
    else:
        cols = [F.col(order_col)]
    ranked, _ = _ranked_with_total(df, cols, idx_col)
    return ranked


def global_cumsum(
    df: DataFrame, sort_cols, val_col: str, out_col: str
) -> DataFrame:
    """Exact ``SUM(val) OVER (ORDER BY sort_cols ROWS UNBOUNDED
    PRECEDING)`` without the single-partition window Spark would plan for
    an unpartitioned frame. Same two-pass shape as ``global_index``:
    range-partition on the order key, sum within partitions in parallel,
    and add broadcast per-partition prefix totals (one row per partition —
    metadata scale). ``sort_cols`` must define a total order (include a
    unique tiebreak) and ``val_col`` should be an exact type (long /
    decimal) so partial-sum order cannot perturb the result."""
    sort_cols = [
        F.col(c) if isinstance(c, str) else c for c in list(sort_cols)
    ]
    pinned = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin, eager=True)
    )
    partials = sorted(
        (r["__pid"], r["s"])
        for r in pinned.groupBy("__pid")
        .agg(F.sum(val_col).alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in partials:
        offsets.append((pid, acc))
        acc += s if s is not None else 0
    spark = df.sparkSession
    off_df = metadata_df(spark, offsets, "__pid int, __csoff long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pinned.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            (F.sum(val_col).over(w) + F.col("__csoff")).cast("long"),
        )
        .drop("__pid", "__csoff")
    )


def avg_rank2_table(df: DataFrame, val_col: str) -> DataFrame:
    """Tie-averaged midrank table for rank statistics (Mann-Whitney,
    Spearman), kept integral: adds ``rank2`` = 2 × the average rank that
    ANSI ``AVG(ROW_NUMBER()) OVER (PARTITION BY value)`` would assign —
    doubled so it stays an exact BIGINT (ties average to .5 steps).
    Input must already be one row per distinct value with a ``cnt``
    column; the prefix count comes from ``global_cumsum`` (range-
    partitioned, never a single-partition window), so the table scales
    to corpus-cardinality value columns. rank2 = 2·cum − cnt + 1 where
    cum is the inclusive running count in value order."""
    cc = global_cumsum(df, [F.col(val_col).asc()], "cnt", "__cum")
    return cc.withColumn(
        "rank2",
        (F.lit(2) * F.col("__cum") - F.col("cnt") + F.lit(1)).cast("long"),
    ).drop("__cum")


# Driver-side guard: the per-group offset table is collected and
# broadcast, so the group column must be metadata-scale. Past this many
# distinct groups the caller almost certainly wanted a per-row window or
# a different keying — fail loudly instead of OOMing the driver.
MAX_GROUPS = 1_000_000


def _grouped_ranked(df: DataFrame, group_cols: list, sort_cols):
    """Shared core of grouped_ntile / grouped_index: one GLOBAL
    range-partitioned rank over (group_cols ASC, sort_cols) — parallel
    regardless of group skew — plus a broadcast per-group (offset, size)
    table. Returns a frame carrying ``__grank`` (global), ``__goff``
    (rows before the group) and ``__gn`` (group size); per-group local
    rank = ``__grank - __goff``. ``sort_cols`` must total-order within
    each group (include a unique tiebreak)."""
    group_cols = list(group_cols)
    full_order = [F.col(c).asc() for c in group_cols] + list(sort_cols)
    pinned = (
        df.repartitionByRange(*full_order)
        .sortWithinPartitions(*full_order)
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin, eager=True)
    )
    # Cardinality guard BEFORE any collect: a high-cardinality group key
    # must fail distributed-side, not OOM the driver while collecting the
    # stats rows the guard was meant to bound (ADVICE r7).
    ngroups = pinned.agg(
        F.count_distinct(*[F.col(c) for c in group_cols]).alias("__g")
    ).collect()[0]["__g"]
    if ngroups > MAX_GROUPS:
        raise ValueError(
            f"grouped rank: {ngroups} distinct groups exceeds "
            f"{MAX_GROUPS} — the per-group offset table is collected to "
            "the driver and broadcast, so the group key must be "
            "metadata-scale. Use a per-row window or re-key first."
        )
    # ONE stats pass feeds both ladders: (pid, group) counts give the
    # per-partition rank offsets (sum over groups per pid) AND the
    # per-group sizes/starts (sum over pids per group) — pid x groups
    # rows, metadata scale
    stats = (
        pinned.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    pid_counts: dict = {}
    grp_counts: dict = {}
    for r in stats:
        pid_counts[r["__pid"]] = pid_counts.get(r["__pid"], 0) + r["__n"]
        key = tuple(r[c] for c in group_cols)
        if any(k is None for k in key):
            # a NULL key would silently sort NULLS FIRST in the range
            # partitioner but is unorderable driver-side — fail loudly
            raise ValueError(
                f"grouped rank: NULL group key {key}; filter or fill "
                "null group columns before bucketing"
            )
        if any(isinstance(k, float) and k != k for k in key):
            # Python sorts NaN arbitrarily while Spark's range partitioner
            # sorts NaN greatest — the broadcast offsets would silently
            # disagree with the partition layout. Reject rather than
            # mis-bucket.
            raise ValueError(
                f"grouped rank: NaN group key {key}; group columns must "
                "not contain NaN (cast to string or filter first)"
            )
        grp_counts[key] = grp_counts.get(key, 0) + r["__n"]
        if len(grp_counts) > MAX_GROUPS:
            raise ValueError(
                f"grouped rank: more than {MAX_GROUPS} distinct groups — "
                "the per-group offset table is collected to the driver "
                "and broadcast, so the group key must be metadata-scale. "
                "Use a per-row window or re-key before bucketing."
            )
    spark = df.sparkSession
    pid_rows, acc = [], 0
    for pid in sorted(pid_counts):
        pid_rows.append((pid, acc))
        acc += pid_counts[pid]
    pid_off = metadata_df(spark, pid_rows, "__pid int, __offset long")
    grp_rows, acc = [], 0
    for key in sorted(grp_counts):
        grp_rows.append((*key, acc, grp_counts[key]))
        acc += grp_counts[key]
    schema_prefix = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in group_cols
    )
    off_df = metadata_df(spark,
        grp_rows, f"{schema_prefix}, __goff long, __gn long"
    )
    wlocal = Window.partitionBy("__pid").orderBy(*full_order)
    ranked = (
        pinned.join(F.broadcast(pid_off), "__pid")
        .withColumn(
            "__grank",
            (F.row_number().over(wlocal) + F.col("__offset")).cast("long"),
        )
        .drop("__pid", "__offset")
    )
    return ranked.join(F.broadcast(off_df), group_cols)


def grouped_index(
    df: DataFrame,
    group_cols: list,
    sort_cols,
    idx_col: str = "idx",
    size_col: str | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (PARTITION BY group_cols ORDER BY
    sort_cols)`` without per-group windows whose partitions scale with
    the data. Optionally also attaches the group size (``COUNT(*) OVER
    (PARTITION BY group_cols)``) as ``size_col`` — it falls out of the
    same broadcast offset table for free."""
    ranked = _grouped_ranked(df, group_cols, sort_cols)
    out = ranked.withColumn(
        idx_col, (F.col("__grank") - F.col("__goff")).cast("long")
    )
    if size_col is not None:
        out = out.withColumn(size_col, F.col("__gn"))
    return out.drop("__grank", "__goff", "__gn")


def grouped_topk(
    df: DataFrame,
    group_cols: list,
    sort_cols,
    k: int,
    idx_col: str = "idx",
) -> DataFrame:
    """Per-group top-k with rank, scale-safe: a window partitioned by
    (input partition id, group) first prunes each group to ≤ k rows PER
    INPUT PARTITION — those window partitions are bounded by the scan
    split size (maxPartitionBytes), never by per-group row counts — then
    the exact per-group rank window runs over the ≤ k·P survivors
    (metadata scale). Output: the rows with rank ≤ k plus ``idx_col``.
    ``sort_cols`` must total-order within each group."""
    sort_cols = list(sort_cols)
    staged = df.withColumn("__pid", F.spark_partition_id())
    wlocal = Window.partitionBy("__pid", *group_cols).orderBy(*sort_cols)
    survivors = (
        staged.withColumn("__lrk", F.row_number().over(wlocal))
        .filter(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    wfinal = Window.partitionBy(*group_cols).orderBy(*sort_cols)
    return (
        survivors.withColumn(idx_col, F.row_number().over(wfinal).cast("long"))
        .filter(F.col(idx_col) <= k)
    )


def grouped_ntile(
    df: DataFrame,
    group_cols: list,
    sort_cols,
    n_buckets: int,
    out_col: str,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (PARTITION BY group_cols ORDER BY
    sort_cols)`` without per-group windows whose partitions scale with
    the data (a few sources x billions of rows = a few giant window
    tasks). One GLOBAL range-partitioned rank over (group_cols ASC,
    sort_cols) — parallel regardless of group skew — then per-group
    local rank = global rank - broadcast group offset, and the ANSI
    NTILE bucket from integer arithmetic on per-group counts (one row
    per group — metadata). ``sort_cols`` must total-order within each
    group (include a unique tiebreak)."""
    ranked = _grouped_ranked(df, list(group_cols), sort_cols)
    local = F.col("__grank") - F.col("__goff")
    q = F.expr(f"__gn DIV {n_buckets}")
    r = F.col("__gn") % n_buckets
    big_end = r * (q + 1)
    bucket = (
        F.when(q == F.lit(0), local)
        .when(
            local <= big_end,
            F.expr(f"(__grank - __goff - 1) DIV (__gn DIV {n_buckets} + 1)")
            + 1,
        )
        .otherwise(
            F.expr(
                f"(__grank - __goff - 1 - (__gn % {n_buckets}) * "
                f"(__gn DIV {n_buckets} + 1)) DIV (__gn DIV {n_buckets})"
            )
            + 1
            + r
        )
    )
    return ranked.withColumn(out_col, bucket.cast("long")).drop(
        "__grank", "__goff", "__gn"
    )


def global_ntile(
    df: DataFrame, sort_cols, n_buckets: int, out_col: str
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY sort_cols)`` without the
    single-partition global window Spark would otherwise plan
    (``WindowExec: No Partition Defined`` — one task holds the whole
    frame). Semantics match ANSI NTILE bit-for-bit: with N rows the first
    ``N mod n`` buckets get ``ceil(N/n)`` rows, the rest ``floor(N/n)`` —
    derived arithmetically from the distributed global rank, so the
    DuckDB oracle can keep its plain NTILE. ``sort_cols`` must define a
    total order (include a unique tiebreak)."""
    ranked, n = _ranked_with_total(df, sort_cols, "__rank")
    if n == 0:
        return ranked.withColumn(out_col, F.col("__rank")).drop("__rank")
    q, r = divmod(n, n_buckets)
    rank = F.col("__rank")
    if q == 0:
        bucket = rank  # fewer rows than buckets: NTILE gives bucket = rank
    else:
        big_end = r * (q + 1)  # last rank inside the ceil-sized buckets
        bucket = F.when(
            rank <= big_end,
            F.expr(f"(__rank - 1) DIV {q + 1}") + 1,
        ).otherwise(F.expr(f"(__rank - 1 - {big_end}) DIV {q}") + 1 + r)
    return ranked.withColumn(out_col, bucket.cast("long")).drop("__rank")


def negative_sample_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 2,
    seed: int = 1,
) -> DataFrame:
    """(anchor_id, j, negative_id) — k deterministic uniform negatives per
    row, never pairing a row with itself.

    Draw j for the anchor at rank r picks partner rank
    ``((r - 1 + 1 + hash(r:j:seed) % (n-1)) % n) + 1`` — the offset lives
    in [1, n-1], so the partner is uniform over the OTHER n-1 rows. The
    rank→id resolution is one equi-join on the rank column (shuffle-
    partitioned by rank; no broadcast needed at any corpus size).
    """
    ids = global_index(df.select(id_col), id_col)
    n = ids.count()
    if n < 2:
        raise ValueError(f"negative sampling needs >= 2 rows, got {n}")
    draw_key = F.concat_ws(
        ":", F.col("idx"), F.col("j"), F.lit(str(seed))
    )
    offset = (poly_hash(draw_key) % (n - 1)) + 1
    pairs = (
        ids.select(F.col(id_col).alias("anchor_id"), "idx")
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(k))))
        .withColumn(
            "__pidx", ((F.col("idx") - 1 + offset) % n + 1).cast("long")
        )
    )
    partners = ids.select(
        F.col(id_col).alias("negative_id"), F.col("idx").alias("__pidx")
    )
    return pairs.join(partners, "__pidx").select(
        "anchor_id", F.col("j").cast("int"), "negative_id"
    )


def bloom_candidates(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m: int = 4096,
) -> DataFrame:
    """Bloom-style runtime filter: prune `fact` down to rows whose key
    *might* be in `dim`, before any shuffle touches the fact table.

    Two deterministic hash positions per key (the poly hash and an
    affine-remixed second hash) are set by the dim side; a fact row
    survives only if BOTH its positions are set. False positives pass
    (the caller's exact join removes them); false negatives cannot occur.
    This is the semi-join reduction every warehouse engine applies to
    selective dim filters (Spark's own runtime row-level filtering does
    the same with an internal bloom agg) — expressed portably so the
    DuckDB oracle replays the identical candidate set.

    Scale: the position set is ≤ 2·|dim| integers — metadata, collected
    once and folded into the plan as a literal (the moral equivalent of
    broadcasting the bit array). The fact table is filtered at the scan,
    never shuffled; the whole filter runs inside codegen. The contract is
    the same as any broadcast: `dim` must be the filter-small side.
    """
    ks = F.col(dim_key).cast("string")
    h = poly_hash(ks)
    p1 = (h % m).cast("long")
    p2 = (((h * 1000003 + 12345) % 1000000007) % m).cast("long")
    pos = sorted(
        r["p"]
        for r in dim.select(
            F.explode(F.array(p1, p2)).alias("p")
        ).distinct().collect()
    )
    lit_pos = F.lit(pos)
    fks = F.col(fact_key).cast("string")
    fh = poly_hash(fks)
    fp1 = (fh % m).cast("long")
    fp2 = (((fh * 1000003 + 12345) % 1000000007) % m).cast("long")
    return fact.filter(
        F.array_contains(lit_pos, fp1) & F.array_contains(lit_pos, fp2)
    )


def global_prefix(
    df: DataFrame,
    sort_cols,
    cum_cols: dict[str, str],
    idx_col: str | None = None,
) -> DataFrame:
    """Fused multi-column exact prefix sums (and optionally the global
    rank) in ONE range-partition pass. Semantics per output column:
    ``SUM(val) OVER (ORDER BY sort_cols ROWS UNBOUNDED PRECEDING)``;
    ``idx_col`` adds ``ROW_NUMBER() OVER (ORDER BY sort_cols)``.

    Chaining ``global_cumsum`` k times materializes (localCheckpoint)
    and range-shuffles the table k times; a query that needs several
    running quantities over the SAME total order (energy distance
    needs four, Wasserstein three) should pay that cost once. Same
    contract as global_cumsum: ``sort_cols`` must be a total order and
    every summed column an exact type (long/decimal) so partial-sum
    order cannot perturb results. ``cum_cols`` maps output name ->
    input column name."""
    sort_cols = [
        F.col(c) if isinstance(c, str) else c for c in list(sort_cols)
    ]
    pinned = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin, eager=True)
    )
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(src).alias(f"__s_{out}") for out, src in cum_cols.items()
    ]
    partials = sorted(
        (r["__pid"], r) for r in pinned.groupBy("__pid").agg(*aggs).collect()
    )
    offsets = []
    acc_cnt = 0
    acc = {out: 0 for out in cum_cols}
    for pid, r in partials:
        offsets.append(
            (pid, acc_cnt, *[acc[out] for out in cum_cols])
        )
        acc_cnt += r["__cnt"]
        for out in cum_cols:
            s = r[f"__s_{out}"]
            acc[out] += s if s is not None else 0
    spark = df.sparkSession
    schema = "__pid int, __idxoff long, " + ", ".join(
        f"__off_{out} long" for out in cum_cols
    )
    off_df = metadata_df(spark, offsets, schema)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_df = pinned.join(F.broadcast(off_df), "__pid")
    for out, src in cum_cols.items():
        out_df = out_df.withColumn(
            out,
            (F.sum(src).over(w) + F.col(f"__off_{out}")).cast("long"),
        )
    if idx_col is not None:
        wr = Window.partitionBy("__pid").orderBy(*sort_cols)
        out_df = out_df.withColumn(
            idx_col,
            (F.row_number().over(wr) + F.col("__idxoff")).cast("long"),
        )
    return out_df.drop(
        "__pid", "__idxoff", *[f"__off_{out}" for out in cum_cols]
    )

"""SparkSession factory with scale-appropriate defaults.

The defaults below are chosen for the 100 TB design point and merely sized
down by env vars for local testing:

  * AQE on — runtime re-planning (skew-join splitting, partition coalescing,
    broadcast-join demotion/promotion) replaces hand-tuned plans.
  * ``spark.sql.shuffle.partitions`` — env-tunable; on a real cluster this is
    set to ~2-3× total cores (or left to AQE coalescing with a high initial
    value); locally 32 matches local[32].
  * Arrow enabled — every pandas interchange (mapInPandas / applyInPandas in
    the multimodal path) is Arrow-batched, never row-at-a-time pickled.
  * Session timezone pinned to UTC so timestamp semantics are engine-stable
    (and match the DuckDB oracle, which uses naive/UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession

try:
    from py4j.protocol import Py4JJavaError
except ImportError:  # Spark Connect images ship no py4j; the narrowed
    # except-sites must still import (they then catch AnalysisException
    # only, and _jdf-style access failures propagate as designed)
    class Py4JJavaError(Exception):
        """Placeholder: never raised when py4j is absent."""

DEFAULT_SHUFFLE_PARTITIONS = "32"

# AQE partition-coalescing floor (r15, guide §2.2/§2.5). With
# ``parallelismFirst`` (Spark's default) AQE coalesces post-shuffle
# partitions down to this byte floor, NOT to the advisory size — and the
# stock 1 MB floor assumes byte-dense work. The engine's hot shuffle
# consumers are COMPUTE-dense per byte (pair-explodes over capped baskets,
# Python/Arrow kernels, window seats over narrow id+hash rows): a few MB
# of shuffle bytes can carry minutes of CPU, and a byte-based floor
# serializes that CPU onto a handful of cores. Measured r15 at sf0.1
# (interleaved same-session A/B, order-reversed control): 16 KB vs 1 MB =
# ngram_jaccard_pairs −29/−45 %, pipeline_clean_corpus −39 %,
# association_rules_q −41 %, canonical_longest_q −29 %, session_window
# −43 %, fast scan-bound queries neutral (−3 % within noise). At the
# 100 TB design point the floor is inert: any real post-shuffle stage
# carries ≫ cores × 16 KB, so coalescing is governed by the advisory
# size exactly as before — the env override exists for clusters that
# want the stock floor back.
DEFAULT_AQE_MIN_PARTITION_SIZE = "16KB"


def get_spark(app_name: str = "iniz-exporters-spark") -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    Local parallelism comes from ``$SPARK_GRAFT_CPUS`` (default ``*``);
    shuffle width from ``$SPARK_GRAFT_SHUFFLE_PARTITIONS`` (default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get(
                "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE",
                DEFAULT_AQE_MIN_PARTITION_SIZE,
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries timestamp[ns]; Spark has no nanos type, so
        # read as long up front (Catalog restores microsecond timestamps) —
        # avoids a failed-and-retried first read job
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def metadata_df(spark: SparkSession, rows, schema):
    """A DataFrame over driver-side metadata rows in ONE partition.

    ``SparkSession.createDataFrame(list, schema)`` parallelizes the list
    into ``defaultParallelism`` pickle slices — on local[32] every job
    that materializes the frame (typically a BroadcastExchange build)
    dispatches 32 tasks, each paying a Python-worker round-trip to
    deserialize a mostly-empty slice. Measured r15: a 3-row broadcast
    build costs 1.22 s/job at 32 slices vs 0.82 s at one (and the slice
    count scales with cluster parallelism, so a real cluster pays more).
    Every engine frame built from a driver list is metadata-scale by
    construction (LUTs, offsets, query sets, band tables), so one slice
    is always right: same rows, same order, same types — only the
    slicing changes.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The driver hands us a SparkSession it built itself; only conf keys that
    are runtime-mutable can be set here (AQE + timezone are; master/memory
    are not).
    """
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        (
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get(
                "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE",
                DEFAULT_AQE_MIN_PARTITION_SIZE,
            ),
        ),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except AnalysisException:
            pass  # CANNOT_MODIFY_CONFIG: static key in this session — fine,
            # it's an optimization. Anything else propagates.
    return spark


def enable_runtime_bloom_filters(
    spark: SparkSession,
    creation_side_max: str = "500MB",
    application_side_min: str = "1KB",
) -> SparkSession:
    """Turn on Catalyst's runtime row-level Bloom-filter injection.

    For a shuffle join where one side carries a selective filter, the
    optimizer aggregates a Bloom filter of the small side's join keys
    (``bloom_filter_agg``) and injects ``might_contain`` into the BIG
    side's scan — rows that cannot join are dropped before the shuffle.
    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling only the ~matching fraction.

    Spark's defaults only trigger on cluster-scale inputs (application
    side ≥ 10GB); the thresholds are parameters so tests can exercise the
    injection locally. Broadcast joins don't need it — the broadcast side
    already prunes via DPP/hash lookup.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        application_side_min,
    )
    return spark


def _estimated_scan_splits(df, target: int):
    """Estimate the file-scan split count from analysis-time metadata only.

    Replays Spark's file bin-packing formula (FilePartition: maxSplitBytes
    = min(maxPartitionBytes, max(openCostInBytes, total/parallelism));
    splits ~= ceil(sum(size_i + openCost) / maxSplitBytes)) over
    ``df.inputFiles()`` — no physical planning, unlike
    ``df.rdd.getNumPartitions()`` which forces the full logical->RDD
    conversion on every call. Returns None when the input is not a plain
    local file scan (in-memory relations, non-file URIs) so the caller can
    fall back to the cached physical count.
    """
    try:
        files = df.inputFiles()
    except (AnalysisException, Py4JJavaError):
        # Spark-side only: streaming relations reject inputFiles() with
        # AnalysisException; exotic relations may fail JVM-side. A repo bug
        # must propagate, not silently disable the estimate.
        return None
    if not files:
        return None
    # production layout shortcut: at >= 4x target files the packed split
    # count can only fall below target under a pathological all-tiny-file
    # layout — skip the per-file stat calls
    if len(files) >= 4 * target:
        return len(files)
    from urllib.parse import unquote, urlparse

    sizes = []
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None
        try:
            sizes.append(os.path.getsize(unquote(p.path)))
        except OSError:
            return None
    spark = df.sparkSession
    jvm_utils = spark.sparkContext._jvm.org.apache.spark.network.util.JavaUtils
    max_part = jvm_utils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    open_cost = jvm_utils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4MB")
    )
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_part, max(open_cost, total // max(target, 1) or 1))
    return max(1, -(-total // max(max_split, 1)))


_SPREAD_CACHE: dict = {}

# Analyzed-plan node prefixes that cannot change the scan's partitioning.
# Anything else (Join, Aggregate, Sort, Repartition, Window, Distinct,
# Union, …) means the physical partition count is a (possibly
# AQE-coalesced) shuffle count, NOT the file-split count — using the scan
# estimate there can wrongly skip the repartition for an expensive kernel.
_BARE_SCAN_NODES = ("Project", "Filter", "Relation", "SubqueryAlias", "View")


def _is_bare_scan(df) -> bool:
    """True iff the analyzed logical plan is scan + narrow ops only, so
    the file-split estimate equals the physical partition count. Analysis
    already ran when the DataFrame was built; no physical planning here."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except (AnalysisException, Py4JJavaError):
        # JVM-side plan rendering failed — treat as not-a-bare-scan and let
        # the caller take the physical-count fallback. Repo-side errors
        # (e.g. _jdf missing under a connect-style session) propagate.
        return False
    for line in plan.splitlines():
        node = line.lstrip(" :+-")
        if node and not node.startswith(_BARE_SCAN_NODES):
            return False
    return True


def spread_for_kernel(df, min_factor: int = 1):
    """Ensure an expensive Python/Arrow kernel gets at least the session's
    core count of input partitions.

    A small single-file parquet input plans as ONE scan split (scan cost is
    trivial either way), which would serialize the per-row kernel work onto
    one core — the dominant cost for shingling/hashing kernels. Inputs that
    already carry >= cores partitions (any production-scale table) pass
    through UNTOUCHED, so no shuffle is added at scale; the round-robin
    repartition only triggers exactly when the input is small enough that
    the shuffle is trivial.

    The split count comes from the relation's file-scan metadata
    (``_estimated_scan_splits``) — NOT ``df.rdd.getNumPartitions()``,
    which would force a full logical-to-RDD physical plan conversion per
    call on hot kernel paths. Non-file inputs fall back to one physical
    count per distinct plan, memoized by ``semanticHash``.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    # file-split estimate ONLY for bare scans: a plan containing a shuffle
    # (join/agg/repartition/…) has the shuffle's partition count, which the
    # scan metadata cannot see — fall back to the memoized physical count
    n = _estimated_scan_splits(df, target) if _is_bare_scan(df) else None
    if n is None:
        try:
            key = (df.semanticHash(), target)
        except (AnalysisException, Py4JJavaError):
            key = None  # unhashable plan shape: skip memoization only
        if key is not None and key in _SPREAD_CACHE:
            n = _SPREAD_CACHE[key]
        else:
            n = df.rdd.getNumPartitions()
            if key is not None:
                _SPREAD_CACHE[key] = n
                if len(_SPREAD_CACHE) > 512:
                    _SPREAD_CACHE.clear()
    if n < target:
        return df.repartition(target)
    return df

"""Expression shims reproducing MySQL semantics the reference relies on.

These are composite Column expressions (pure Catalyst — no UDFs), each
reproducing one MySQL behavior identified in SURVEY.md §2.8/§7.3:

  * ``mysql_group_concat`` — GROUP_CONCAT(DISTINCT x ORDER BY w SEPARATOR s)
    (reference concept_csv_export.py:348-349). DISTINCT applies to the value
    while ordering is by a different column; the canonical rule here is
    min-weight-wins per distinct value, ties broken by the value itself —
    deterministic where MySQL is underspecified.
  * ``mysql_cast_unsigned`` — CAST(expr AS UNSIGNED)
    (reference concept_csv_export.py:304-306). MySQL parses the longest
    leading digit prefix and yields 0 for non-numeric strings; Spark's cast
    yields NULL. The shim extracts leading digits and coalesces to 0.
  * ``strip_newlines`` — REPLACE(REPLACE(x,'\\r',''),'\\n','')
    (reference concept_csv_export.py:318).
  * ``pack_kv`` — CONCAT(name, ':', value) attribute packing
    (reference location_csv_export.py:114).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def mysql_group_concat(
    value: Column | str,
    order_by: Column | str | None = None,
    sep: str = ";",
    assume_distinct: bool = False,
) -> Column:
    """Aggregate: distinct ``value``s joined by ``sep``, ordered by the
    minimum ``order_by`` seen for each distinct value (value as tiebreak).

    Runs as a single hash-aggregate: collect (weight, value) structs, then
    array ops (all JVM-side) do the distinct/order/join. The in-group dedup
    fold is O(n²) per group, so for groups of unbounded cardinality use
    ``group_concat_two_phase`` instead — it pushes DISTINCT into a
    pre-aggregation (map-side combine shrinks the shuffle) and sets
    ``assume_distinct=True`` here to skip the fold entirely.
    """
    v = F.col(value) if isinstance(value, str) else value
    if order_by is None:
        # GROUP_CONCAT(DISTINCT x) — MySQL implicitly sorts distinct values.
        return F.array_join(F.array_sort(F.collect_set(v)), sep)
    w = F.col(order_by) if isinstance(order_by, str) else order_by
    pairs = F.collect_list(F.struct(w.alias("w"), v.alias("v")))
    # min-weight per distinct value: sort (w, v) pairs, keep first occurrence
    # of each v in that order → equivalent to ordering distinct v by (min_w, v).
    sorted_pairs = F.array_sort(pairs)
    if assume_distinct:
        ordered = F.transform(sorted_pairs, lambda x: x["v"])
        return F.array_join(F.filter(ordered, lambda x: x.isNotNull()), sep)
    dedup = F.aggregate(
        sorted_pairs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.array_contains(acc, x["v"]) | x["v"].isNull(), acc
        ).otherwise(F.concat(acc, F.array(x["v"]))),
    )
    return F.array_join(dedup, sep)


def group_concat_two_phase(df, keys, value: str, order_by: str, sep: str = ";",
                           alias: str | None = None):
    """GROUP_CONCAT(DISTINCT value ORDER BY min(order_by), value) as a
    two-phase plan: ``groupBy(keys + value).agg(min(order_by))`` collapses
    duplicates with map-side partial aggregation (the shuffle carries one
    row per distinct (key, value) instead of one per input row), then the
    final group assembles the ordered string over already-distinct values —
    no per-group O(n²) dedup fold. This is the 100 TB shape of the
    reference's GROUP_CONCAT (concept_csv_export.py:348-349).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    pre = df.groupBy(*keys, value).agg(F.min(order_by).alias("__w"))
    return pre.groupBy(*keys).agg(
        mysql_group_concat(value, "__w", sep, assume_distinct=True).alias(
            alias or value
        )
    )


def mysql_cast_unsigned(col: Column | str) -> Column:
    """MySQL ``CAST(x AS UNSIGNED)``: longest leading digit run, else 0.

    MySQL also tolerates leading whitespace and an optional '+' sign
    (' 123' → 123, '+12' → 12), which matters for the PIH|Number vs
    PIH|Name discriminator on reference-term codes; a leading '-' yields
    MySQL's unsigned wraparound, which we pin to 0 explicitly (no caller
    feeds negative codes, and wraparound would be a trap to reproduce).
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_extract(c.cast("string"), r"^\s*\+?(\d+)", 1)
    return F.coalesce(
        F.when(digits == "", F.lit(0)).otherwise(digits.cast("long")), F.lit(0)
    )


def strip_newlines(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[\\r\\n]", "")


def pack_kv(name: Column | str, value: Column | str) -> Column:
    n = F.col(name) if isinstance(name, str) else name
    v = F.col(value) if isinstance(value, str) else value
    return F.concat_ws(":", n, v)

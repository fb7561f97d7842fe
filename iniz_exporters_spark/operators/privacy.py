"""PII detection and redaction for training-data pipelines.

Web-scale corpora carry emails, phone numbers, IPs, and national-id-shaped
strings that must be scrubbed (or at least counted) before training. The
reference has no such operator (it exports curated EMR *metadata*, never
patient rows — see reference concept_csv_export.py:1-10), so this is part
of the SURVEY §7 phase-5 extension surface.

Everything here is pure Catalyst (``regexp_replace`` / ``regexp_count``):
per-row expressions inside whole-stage codegen, zero shuffles, so redacting
a 100 TB corpus costs exactly one scan and the filter/projection still push
down around it. The patterns are deliberately restricted to syntax valid
and identically-matching in BOTH Java regex (Spark) and RE2 (DuckDB) —
no backreferences, no lookaround — so the oracle replays them verbatim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: (kind, pattern, replacement) in APPLICATION ORDER. Order matters:
#: IPv4 must run before PHONE (dotted digit runs), and SSN before PHONE
#: (both are dashed digit groups; SSN's 3-2-4 shape is disjoint from
#: PHONE's 3-3-4 but redacting specific→general keeps intent obvious).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its ``<KIND>`` token, in the fixed
    pattern order above."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts over the ORIGINAL text (one column per kind).

    Counting on the unredacted text keeps each kind independent of the
    application order; with the disjoint pattern set above the totals agree
    with what ``redact_pii`` replaces."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pattern))
        for kind, pattern, _ in PII_PATTERNS
    }


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """(quasi..., group_size, n_distinct_sensitive, k_violation,
    l_diversity) — the re-identification audit: every quasi-identifier
    combination's equivalence-class size (k-anonymity; Sweeney 2002) and
    its count of distinct sensitive values (l-diversity; Machanavelli et
    al. 2007). Rows with group_size < k are releasable only after
    generalization/suppression; groups with l = 1 leak the sensitive
    attribute exactly even when k holds.

    Scale: one groupBy on the quasi columns (map-side partial count +
    distinct-aggregate); output is equivalence-class scale, not row
    scale. No row payloads survive the aggregate.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).alias(
                "n_distinct_sensitive"
            ),
        )
        .select(
            *quasi_cols,
            "group_size",
            "n_distinct_sensitive",
            (F.col("group_size") < k).alias("k_violation"),
            (F.col("n_distinct_sensitive") <= 1).alias("l1_leak"),
        )
    )

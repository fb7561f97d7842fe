"""Text primitives for the training-data pipeline operators (SURVEY §7 phase 5).

All pure Catalyst Column expressions — no Python UDFs — so they run JVM-side
inside whole-stage codegen and scale linearly with input splits.

Cross-engine determinism: ``poly_hash`` is a plain polynomial fold
(h = h*31 + ascii(c) mod 1e9+7) rather than xxhash/murmur, so the DuckDB
oracle can reproduce it exactly with list_reduce — every downstream operator
(MinHash, SimHash, LSH buckets, fingerprints) stays hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

MOD = 1_000_000_007
TOKEN_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_RE), lambda t: t != "")


def whitespace_token_count(col: Column | str) -> Column:
    """Token count on whitespace runs (trimmed); 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def poly_hash(col: Column | str) -> Column:
    """Polynomial string hash: fold h = (h*31 + ascii(char)) % (1e9+7).

    Equivalent DuckDB: list_reduce(list_transform(string_split(s,''),
    x -> ascii(x)::BIGINT), (a, b) -> (a*31 + b) % 1000000007) with an empty
    guard — the no-initial-value fold matches because 0*31+c == c.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
        )
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """All k-char shingles of a string as an array (distinct NOT applied).

    Built from sequence+transform so it stays JVM-side; strings shorter than
    k yield a single shingle (the whole string) to keep every doc signed.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k)
    )

"""Host/URL-level web-corpus curation (CCNet-style).

The standard web-corpus lever: no single host may dominate the training
mix. Three pieces, all deterministic and shuffle-lean:

  * ``url_host`` / ``apex_domain`` — pure Catalyst URL parsing
    (``parse_url``), one codegen'd scan, no Python.
  * ``host_cap`` — at most ``cap`` docs per host, drawn uniformly and
    reproducibly (content-keyed hash rank — the per-group reservoir shape
    from operators/sampling.py); one window shuffle on the host key.
  * ``host_rate_sample`` — per-host adaptive downsampling to ~``target``
    rows/host: keep iff ``poly_hash(id) % host_n < target``. Exact in
    expectation, content-keyed (rerun/engine/partitioning-stable), and the
    host-size frame it joins is host-count-sized metadata, not corpus rows.

At 100 TB: host counts are a ~millions-row aggregate (broadcastable); the
cap window parallelizes per host and a mega-host costs one partition's
sort of its own rows, never a global sort. Skewed hosts are exactly the
rows this operator deletes, so the skew self-heals downstream.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.operators.sampling import reservoir_per_group


def url_host(url: Column | str) -> Column:
    """Hostname of a URL (port excluded), JVM-side via ``parse_url``."""
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("HOST"))


#: Multi-label public suffixes the apex heuristic must not collapse.
#: A deliberately small embedded subset of the Mozilla Public Suffix List
#: (publicsuffix.org, MPL-2.0 data) covering the highest-traffic ccTLD
#: second-level registries; a production deployment swaps in the full
#: list (same shape — a literal membership array the filter broadcasts).
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "com.mx", "com.ar", "com.tr",
    "co.za", "org.za", "com.sg", "com.hk", "co.nz", "org.nz",
)


def apex_domain(host: Column | str) -> Column:
    """Registrable domain: the last two dot-labels, or the last THREE when
    the final two form a multi-label public suffix ('shop.example.co.uk'
    → 'example.co.uk', 'www.news.example.com' → 'example.com');
    single-label hosts pass through. Suffix membership is a literal
    array test — pure codegen, no lookup join — against the embedded
    PSL subset above."""
    c = F.col(host) if isinstance(host, str) else host
    parts = F.split(c, r"\.")
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(
            (F.size(parts) >= 3)
            & F.array_contains(F.lit(list(MULTI_LABEL_SUFFIXES)), last2),
            last3,
        )
        .when(F.size(parts) >= 2, last2)
        .otherwise(c)
    )


def canonicalize_url(url: Column | str, drop_param_prefix: str = "utm_") -> Column:
    """Canonical form of a URL for dedup/grouping: https scheme, lowercased
    host (default port dropped by HOST extraction), trailing slashes
    stripped from the path, tracking parameters (``utm_*`` by default)
    removed from the query string. Pure Catalyst — parse_url + a
    filter/join over the split query — one codegen'd scan."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    q = F.array_join(
        F.filter(
            F.split(F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit("")), "&"),
            # re.escape: a prefix like "x." or "a+" must match literally,
            # not as a regex metacharacter.
            lambda p: (~p.rlike(f"^{re.escape(drop_param_prefix)}"))
            & (p != F.lit("")),
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def host_cap(
    df: DataFrame,
    host_col: str,
    id_col: str,
    cap: int,
    rn_col: str = "rn",
) -> DataFrame:
    """At most ``cap`` rows per host, chosen uniformly & deterministically
    (hash-rank reservoir — see reservoir_per_group for the scale shape)."""
    return reservoir_per_group(df, host_col, id_col, cap, rn_col=rn_col)


def host_rate_sample(
    df: DataFrame,
    host_col: str,
    id_col: str,
    target: int,
) -> DataFrame:
    """Rows surviving per-host downsampling to ~``target`` rows/host:
    keep iff ``poly_hash(id) % host_n < target`` — hosts at or under
    ``target`` keep everything, larger hosts keep a uniform ~target-sized
    deterministic subset."""
    counts = df.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("__host_n")
    )
    gate = (
        poly_hash(F.col(id_col).cast("string")) % F.col("__host_n")
    ) < F.lit(target)
    return df.join(counts, host_col).filter(gate).drop("__host_n")

"""Registry chunk 10: round-11 session-3 additions (web-corpus curation +
retrieval + forecasting extension surface; VERDICT r10 #7's suggested
operators lead the list).

New registrations append here so chunk p09 stays under the size budget;
registration order remains append-only. See queries/__init__.py.
"""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.session import metadata_df
from iniz_exporters_spark.queries.p01 import _SQL_POLY
from iniz_exporters_spark.pinning import pin


# ---------------------------------------------------------------------------
# PII-risk scoring (VERDICT r10 #7). pii_redact counts and scrubs; this
# scores: severity-weighted per-doc risk with a Luhn-checksum credit-card
# validator (ISO/IEC 7812) and a co-occurrence escalation when two or more
# distinct PII kinds land in the same document. The synthetic corpus has no
# real PII, so each doc is spiked deterministically from doc_id (the
# pii_redact convention) with a VARYING mix of kinds — including a 16-digit
# card number whose Luhn validity depends on doc_id, so both checksum
# branches are exercised on every run.
# ---------------------------------------------------------------------------

# doc_id-keyed spike: kinds hit different residue classes so docs carry
# 0..5 kinds and the co-occurrence multiplier fires on a real subset.
_PII_RISK_SPIKE_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id::VARCHAR"
    "      || '@mail.example.org' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 1 THEN ' ssn ' ||"
    "      lpad(((doc_id % 900) + 100)::VARCHAR, 3, '0') || '-' ||"
    "      lpad(((doc_id % 89) + 10)::VARCHAR, 2, '0') || '-' ||"
    "      lpad(((doc_id % 9000) + 1000)::VARCHAR, 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 2 THEN ' call 555-867-' ||"
    "      lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 6 = 3 THEN ' from 10.' ||"
    "      (doc_id % 200)::VARCHAR || '.0.1' ELSE '' END"
    # doc_id is reduced mod 1e9 BEFORE the Knuth multiplier so the
    # product stays under int64 ((1e9-1) * 2654435761 ≈ 2.65e18 < 9.2e18)
    # at ANY corpus size — the unreduced form overflowed (ANSI error /
    # DuckDB OOR) for doc_id ≥ ~3.47e9 (ADVICE r11). Identical residues
    # at every gated scale (doc_id ≪ 1e9 there).
    " || CASE WHEN doc_id % 2 = 0 THEN ' card 4' ||"
    "      lpad((((doc_id % 1000000000) * 2654435761)"
    "            % 1000000000000000)::VARCHAR,"
    "           15, '0') ELSE '' END"
)

# Luhn over the 16 digits of cc (1-based string index i; position from the
# right r = 17-i doubles when even, with the >9 fold-back) — pure integer
# arithmetic on ascii codes, identical in both engines (DETERMINISM rule 3).
_SQL_LUHN = (
    "list_sum(list_transform(range(1, 17), i ->"
    " CASE WHEN (17 - i) % 2 = 0 THEN"
    "   CASE WHEN 2 * (ascii(cc[i]) - 48) > 9"
    "        THEN 2 * (ascii(cc[i]) - 48) - 9"
    "        ELSE 2 * (ascii(cc[i]) - 48) END"
    " ELSE ascii(cc[i]) - 48 END))"
)


@register(
    "pii_risk_score_q",
    f"""
    WITH spiked AS (
        SELECT doc_id, {_PII_RISK_SPIKE_SQL} AS t FROM documents
    ),
    counted AS (
        SELECT doc_id,
               length(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'
               ))::INT AS n_email,
               length(regexp_extract_all(t,
                   '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b'))::INT AS n_ssn,
               length(regexp_extract_all(t,
                   '\\b\\+?\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b'
               ))::INT AS n_phone,
               length(regexp_extract_all(t,
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'
               ))::INT AS n_ipv4,
               regexp_extract(t, '\\b(\\d{{16}})\\b', 1) AS cc
        FROM spiked
    ),
    luhn AS (
        SELECT *,
               CASE WHEN length(cc) = 16 THEN 1 ELSE 0 END AS has_cc,
               CASE WHEN length(cc) = 16 AND {_SQL_LUHN} % 10 = 0
                    THEN 1 ELSE 0 END AS cc_luhn_valid
        FROM counted
    ),
    scored AS (
        SELECT *,
               (CASE WHEN n_email > 0 THEN 1 ELSE 0 END
                + CASE WHEN n_ssn > 0 THEN 1 ELSE 0 END
                + CASE WHEN n_phone > 0 THEN 1 ELSE 0 END
                + CASE WHEN n_ipv4 > 0 THEN 1 ELSE 0 END
                + has_cc) AS n_kinds,
               (3 * n_email + 5 * n_ssn + 2 * n_phone + 1 * n_ipv4
                + CASE WHEN cc_luhn_valid = 1 THEN 8
                       WHEN has_cc = 1 THEN 1 ELSE 0 END) AS base_score
        FROM luhn
    )
    SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4, has_cc, cc_luhn_valid,
           n_kinds,
           (base_score
            * CASE WHEN n_kinds >= 2 THEN 2 ELSE 1 END)::INT AS risk_score,
           CASE WHEN base_score = 0 THEN 'none'
                WHEN base_score * CASE WHEN n_kinds >= 2 THEN 2 ELSE 1 END
                     < 8 THEN 'low'
                WHEN base_score * CASE WHEN n_kinds >= 2 THEN 2 ELSE 1 END
                     < 20 THEN 'medium'
                ELSE 'high' END AS risk_tier
    FROM scored
    """,
)
def pii_risk_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity-weighted PII risk per document: regex counts per kind,
    Luhn-validated card detection, and a x2 escalation when >= 2 kinds
    co-occur — the triage layer above pii_redact's scrubbing.

    Scale: one corpus scan, every expression per-row inside whole-stage
    codegen (regexp counts + a 16-step integer fold); zero shuffles, so
    cost is linear in bytes scanned at any corpus size. Emits every doc
    (DETERMINISM rule 11) — risk_tier 'none' rows stay visible.
    """
    return pii_risk_scores(Catalog(spark, sf_dir).documents)


def pii_risk_scores(d: DataFrame) -> DataFrame:
    """DataFrame-level PII-risk transform (stateless per-row map): works
    identically on a batch frame and a readStream frame — the streaming
    parity test drives this exact function through a file source."""
    sid = F.col("doc_id").cast("string")
    spiked = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" reach user"), sid, F.lit("@mail.example.org")),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(" ssn "),
                F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 89 + 10).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(
                    (F.col("doc_id") % 9000 + 1000).cast("string"), 4, "0"
                ),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit(" call 555-867-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 6 == 3,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" card 4"),
                F.lpad(
                    (
                        ((F.col("doc_id") % 1000000000) * 2654435761)
                        % 1000000000000000
                    ).cast("string"),
                    15,
                    "0",
                ),
            ),
        ).otherwise(""),
    )
    t = d.select("doc_id", spiked.alias("t"))
    cc = F.regexp_extract(F.col("t"), r"\b(\d{16})\b", 1)
    counted = t.select(
        "doc_id",
        F.regexp_count(
            F.col("t"),
            F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        ).cast("int").alias("n_email"),
        F.regexp_count(F.col("t"), F.lit(r"\b\d{3}-\d{2}-\d{4}\b"))
        .cast("int").alias("n_ssn"),
        F.regexp_count(
            F.col("t"), F.lit(r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b")
        ).cast("int").alias("n_phone"),
        F.regexp_count(
            F.col("t"),
            F.lit(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
        ).cast("int").alias("n_ipv4"),
        cc.alias("cc"),
    )
    ccchars = F.split(F.col("cc"), "")
    digit = lambda i: F.ascii(F.element_at(ccchars, i)) - 48  # noqa: E731
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (17 - i) % 2 == 0,
            F.when(2 * digit(i) > 9, 2 * digit(i) - 9).otherwise(
                2 * digit(i)
            ),
        ).otherwise(digit(i)),
    )
    has_cc = F.when(F.length("cc") == 16, 1).otherwise(0)
    luhn = counted.select(
        "*",
        has_cc.alias("has_cc"),
        F.when((F.length("cc") == 16) & (luhn_sum % 10 == 0), 1)
        .otherwise(0)
        .alias("cc_luhn_valid"),
    )
    flag = lambda c: F.when(F.col(c) > 0, 1).otherwise(0)  # noqa: E731
    n_kinds = (
        flag("n_email")
        + flag("n_ssn")
        + flag("n_phone")
        + flag("n_ipv4")
        + F.col("has_cc")
    )
    base = (
        3 * F.col("n_email")
        + 5 * F.col("n_ssn")
        + 2 * F.col("n_phone")
        + 1 * F.col("n_ipv4")
        + F.when(F.col("cc_luhn_valid") == 1, 8)
        .when(F.col("has_cc") == 1, 1)
        .otherwise(0)
    )
    scored = luhn.select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "has_cc",
        "cc_luhn_valid",
        n_kinds.alias("n_kinds"),
        base.alias("base_score"),
    )
    risk = F.col("base_score") * F.when(F.col("n_kinds") >= 2, 2).otherwise(
        1
    )
    return scored.select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "has_cc",
        "cc_luhn_valid", "n_kinds",
        risk.cast("int").alias("risk_score"),
        F.when(F.col("base_score") == 0, "none")
        .when(risk < 8, "low")
        .when(risk < 20, "medium")
        .otherwise("high")
        .alias("risk_tier"),
    )


# ---------------------------------------------------------------------------
# Unicode script-mixing / mojibake audit. Web corpora carry encoding damage
# (U+FFFD replacement chars, stray control bytes) and script spoofing /
# boilerplate in unexpected scripts; the standard curation move is a per-doc
# script histogram + a mixed-script flag. The synthetic corpus is pure
# ASCII, so docs are spiked deterministically with Cyrillic / Greek / CJK
# words, replacement chars, and a control char, keyed on doc_id.
# Both engines' regex libraries (Java util.regex, RE2) accept the
# \x{hhhh} codepoint-class syntax, so the SAME pattern strings are used.
# ---------------------------------------------------------------------------

_SCRIPT_SPIKE_SQL = (
    "text"
    " || CASE WHEN doc_id % 4 = 1 THEN ' привет"
    " мир' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 2 THEN ' αλφα"
    " βητα' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 3 THEN ' 数据清洗'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 10 = 0 THEN ' ��' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(7) ELSE '' END"
)

_SCRIPT_CLASSES = (
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("greek", "[\\x{0370}-\\x{03FF}]"),
    ("cjk", "[\\x{4E00}-\\x{9FFF}]"),
    ("replacement", "\\x{FFFD}"),
    ("control", "[\\x{0001}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]"),
)


@register(
    "script_mix_q",
    f"""
    WITH spiked AS (
        SELECT doc_id, {_SCRIPT_SPIKE_SQL} AS t FROM documents
    ),
    counted AS (
        SELECT doc_id,
               {", ".join(
                   f"length(regexp_extract_all(t, '{pat}'))::INT AS n_{k}"
                   for k, pat in _SCRIPT_CLASSES
               )}
        FROM spiked
    )
    SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_replacement,
           n_control,
           (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
            + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
            + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
            + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END)::INT AS n_scripts,
           CASE WHEN (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
                      + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
                      + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
                      + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END) >= 2
                THEN 1 ELSE 0 END AS mixed_script,
           CASE WHEN n_replacement > 0 OR n_control > 0
                THEN 1 ELSE 0 END AS mojibake
    FROM counted
    """,
)
def script_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Unicode script histogram + mixed-script and mojibake
    flags — the encoding-damage / script-spoofing audit of a web-corpus
    intake pipeline.

    Scale: per-row regexp counts in whole-stage codegen over one corpus
    scan; zero shuffles. Emits every doc with integer flags
    (DETERMINISM rule 11).
    """
    return script_mix_flags(Catalog(spark, sf_dir).documents)


def script_mix_flags(d: DataFrame) -> DataFrame:
    """DataFrame-level script-mix transform (stateless per-row map);
    batch/stream agnostic — see the streaming parity test."""
    spiked = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 1, F.lit(" привет мир")
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 4 == 2, F.lit(" αλφα βητα")
        ).otherwise(""),
        F.when(F.col("doc_id") % 4 == 3, F.lit(" 数据清洗")).otherwise(""),
        F.when(F.col("doc_id") % 10 == 0, F.lit(" ��")).otherwise(""),
        F.when(F.col("doc_id") % 7 == 0, F.lit("\x07")).otherwise(""),
    )
    t = d.select("doc_id", spiked.alias("t"))
    counted = t.select(
        "doc_id",
        *[
            F.regexp_count(F.col("t"), F.lit(pat)).cast("int").alias(f"n_{k}")
            for k, pat in _SCRIPT_CLASSES
        ],
    )
    present = lambda c: F.when(F.col(c) > 0, 1).otherwise(0)  # noqa: E731
    n_scripts = (
        present("n_latin")
        + present("n_cyrillic")
        + present("n_greek")
        + present("n_cjk")
    )
    return counted.select(
        "doc_id", "n_latin", "n_cyrillic", "n_greek", "n_cjk",
        "n_replacement", "n_control",
        n_scripts.cast("int").alias("n_scripts"),
        F.when(n_scripts >= 2, 1).otherwise(0).alias("mixed_script"),
        F.when(
            (F.col("n_replacement") > 0) | (F.col("n_control") > 0), 1
        ).otherwise(0).alias("mojibake"),
    )


# ---------------------------------------------------------------------------
# Wildcard-suffix host blocklist. Real crawler blocklists match hosts by
# registrable-domain suffix ('example.net' blocks every subdomain); the
# scalable plan is NOT rule-by-rule LIKE scans but a suffix-chain explode:
# each host emits its label suffixes (www.a.example.com ->
# [www.a.example.com, a.example.com, example.com, com]) and the match is a
# plain equi-join against the (broadcast) rule table — O(labels) rows per
# host, never O(rules) comparisons per host.
# ---------------------------------------------------------------------------

_BLOCK_RULES = (
    "src1.example.com",
    "cdn.src2.example.com",
    "example.net",
    "www.src4.example.com",
)

_HOST_SYNTH_SQL = (
    "CASE doc_id % 3"
    " WHEN 0 THEN source || '.example.com'"
    " WHEN 1 THEN 'cdn.' || source || '.example.com'"
    " ELSE 'www.mirror-' || source || '.example.net' END"
)


@register(
    "host_blocklist_q",
    f"""
    WITH rules(rule) AS (
        VALUES {", ".join(f"('{r}')" for r in _BLOCK_RULES)}
    ),
    hosts AS (
        SELECT doc_id, {_HOST_SYNTH_SQL} AS host FROM documents
    ),
    suffixes AS (
        SELECT doc_id, host, sfx
        FROM hosts, UNNEST(list_transform(
            range(1, len(string_split(host, '.')) + 1),
            i -> array_to_string(string_split(host, '.')[i:], '.')
        )) AS u(sfx)
    ),
    matched AS (
        SELECT s.doc_id, s.host, r.rule,
               ROW_NUMBER() OVER (
                   PARTITION BY s.doc_id
                   ORDER BY length(r.rule) DESC, r.rule) AS rn
        FROM suffixes s JOIN rules r ON s.sfx = r.rule
    )
    SELECT h.doc_id, h.host,
           CASE WHEN m.rule IS NULL THEN 0 ELSE 1 END AS blocked,
           COALESCE(m.rule, '') AS matched_rule,
           COALESCE(len(string_split(m.rule, '.')), 0)::INT AS rule_labels
    FROM hosts h
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
        ON h.doc_id = m.doc_id
    """,
)
def host_blocklist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-wildcard blocklist gate over synthesized hosts: blocked
    iff the host or any of its parent domains equals a rule; the most
    specific (longest) matching rule wins, lexicographic tiebreak.

    Scale: hosts explode into their label-suffix chains (<= ~6 rows per
    host) and equi-join the broadcast rule table — the wildcard match
    never scans rules per host, and the corpus-side join key is the
    suffix, so Catalyst broadcasts the small side. Emits every doc with
    an integer blocked flag (DETERMINISM rule 11).
    """
    d = Catalog(spark, sf_dir).documents
    host = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("source"), F.lit(".example.com")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("cdn."), F.col("source"), F.lit(".example.com")),
        )
        .otherwise(
            F.concat(
                F.lit("www.mirror-"), F.col("source"), F.lit(".example.net")
            )
        )
    )
    hosts = d.select("doc_id", host.alias("host"))
    parts = F.split(F.col("host"), r"\.")
    sfx = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(
                F.slice(parts, i, F.size(parts) - i + 1), "."
            ),
        )
    )
    suffixes = hosts.select("doc_id", "host", sfx.alias("sfx"))
    rules = metadata_df(spark,
        [(r,) for r in _BLOCK_RULES], "rule string"
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("rule").desc(), F.col("rule")
    )
    matched = (
        suffixes.join(F.broadcast(rules), F.col("sfx") == F.col("rule"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "rule")
    )
    return (
        hosts.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            F.when(F.col("rule").isNull(), 0).otherwise(1).alias("blocked"),
            F.coalesce(F.col("rule"), F.lit("")).alias("matched_rule"),
            F.coalesce(
                F.size(F.split(F.col("rule"), r"\.")), F.lit(0)
            ).cast("int").alias("rule_labels"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-host mirrored-content grouping (VERDICT r10 #7's suggested
# URL/host-level near-dup complement). Web corpora carry the same article
# on many mirrors/CDNs; host-level dedup policy needs per-host mirror
# accounting, not just per-doc dedup. Content identity is the BAG-OF-WORDS
# fingerprint (polynomial hash of the sorted distinct token set) — the
# canonical "same article, reflowed/reordered by the mirror" key, which is
# also what the synthetic corpus actually exercises at every scale (exact
# text duplicates only appear at sf0.1). Hosts are synthesized
# source+doc_id-keyed so mirrored content genuinely lands on different
# hosts.
# ---------------------------------------------------------------------------

_MIRROR_HOST_SQL = (
    "source || '-h' || (doc_id % 7)::VARCHAR || '.example.com'"
)

_MIRROR_FP_SQL = _SQL_POLY.format(
    s="array_to_string(list_sort(list_distinct("
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " x -> x <> ''))), ' ')"
)


@register(
    "host_mirror_q",
    f"""
    WITH d AS (
        SELECT {_MIRROR_HOST_SQL} AS host,
               {_MIRROR_FP_SQL} AS fp
        FROM documents
    ),
    fh AS (
        SELECT fp, host, COUNT(*) AS n_fh FROM d GROUP BY fp, host
    ),
    fstats AS (
        SELECT fp, COUNT(*) AS n_hosts FROM fh GROUP BY fp
    ),
    partners AS (
        SELECT a.host, COUNT(DISTINCT b.host) AS n_mirror_partners
        FROM fh a JOIN fh b ON a.fp = b.fp AND a.host <> b.host
        GROUP BY a.host
    ),
    hstats AS (
        SELECT fh.host,
               SUM(fh.n_fh) AS n_docs,
               SUM(CASE WHEN fs.n_hosts >= 2 THEN fh.n_fh ELSE 0 END)
                   AS n_mirrored_docs
        FROM fh JOIN fstats fs ON fh.fp = fs.fp
        GROUP BY fh.host
    )
    SELECT h.host,
           h.n_docs::BIGINT AS n_docs,
           h.n_mirrored_docs::BIGINT AS n_mirrored_docs,
           COALESCE(p.n_mirror_partners, 0)::BIGINT AS n_mirror_partners,
           CAST(ROUND(h.n_mirrored_docs::DOUBLE / h.n_docs, 6) AS DOUBLE)
               + 0.0 AS mirror_rate
    FROM hstats h LEFT JOIN partners p ON h.host = p.host
    """,
)
def host_mirror_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host mirrored-content accounting: how much of each host's
    inventory also appears (byte-identical) on at least one OTHER host,
    and how many distinct mirror partners each host has.

    Scale: content hashes shuffle once on fp (metadata-width rows); the
    per-fp host fan-out and the partner self-join are bounded by the
    duplicate-group width (copies of one document), never corpus-
    quadratic; per-host rollups are plain map-side-combining aggs.
    """
    from iniz_exporters_spark.functions.text import poly_hash, tokens

    bow = F.array_join(
        F.array_sort(F.array_distinct(tokens("text"))), " "
    )
    d = Catalog(spark, sf_dir).documents.select(
        F.concat(
            F.col("source"),
            F.lit("-h"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        poly_hash(bow).alias("fp"),
    )
    # fh is read by FOUR consumers (fstats, both partner-join sides,
    # hstats); unpinned, Spark re-runs the corpus scan + full-text
    # polynomial hash per consumer — pin once (persist analogue)
    fh = d.groupBy("fp", "host").agg(
        F.count(F.lit(1)).alias("n_fh")
    ).transform(pin)
    fstats = fh.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    partners = (
        fh.select("fp", "host")
        .join(
            fh.select(F.col("fp").alias("fp2"), F.col("host").alias("host2")),
            (F.col("fp") == F.col("fp2")) & (F.col("host") != F.col("host2")),
        )
        .groupBy("host")
        .agg(F.count_distinct("host2").alias("n_mirror_partners"))
    )
    hstats = (
        fh.join(fstats, "fp")
        .groupBy("host")
        .agg(
            F.sum("n_fh").alias("n_docs"),
            F.sum(
                F.when(F.col("n_hosts") >= 2, F.col("n_fh")).otherwise(0)
            ).alias("n_mirrored_docs"),
        )
    )
    return hstats.join(partners, "host", "left").select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_mirrored_docs").cast("long").alias("n_mirrored_docs"),
        F.coalesce(F.col("n_mirror_partners"), F.lit(0))
        .cast("long")
        .alias("n_mirror_partners"),
        (
            F.round(
                F.col("n_mirrored_docs").cast("double") / F.col("n_docs"), 6
            )
            + F.lit(0.0)
        ).alias("mirror_rate"),
    )


# ---------------------------------------------------------------------------
# Theta-method forecast (Assimakopoulos & Nikolopoulos 2000; the M3
# competition winner): decompose the day-ordered revenue series into the
# theta=0 line (the OLS linear fit, extrapolated) and the theta=2 line
# (2y_t - fit, smoothed by SES), and forecast their average. The SES
# coefficient is DYADIC (alpha = 1/2) so the fold is exact halvings; the
# one non-dyadic division (the OLS slope) is a single IEEE divide of
# exactly-computed decimal/integer sums — identical in both engines.
# ---------------------------------------------------------------------------


@register(
    "theta_forecast_q",
    """
    WITH daily AS (
        SELECT o_orderpriority AS pri,
               CAST(o_orderdate AS DATE) AS day,
               SUM(o_totalprice::DECIMAL(18,4)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    idx AS (
        SELECT pri, rev,
               ROW_NUMBER() OVER (PARTITION BY pri ORDER BY day) AS t
        FROM daily
    ),
    stats AS (
        SELECT pri,
               COUNT(*)::BIGINT AS n,
               SUM(rev) AS sy,
               SUM(rev * t) AS sty,
               list_transform(
                   list_sort(list(struct_pack(t := t, y := rev::DOUBLE))),
                   s -> s.y
               ) AS v
        FROM idx
        GROUP BY pri
    ),
    fit AS (
        SELECT pri, n, v,
               (n * sty - (n * (n + 1) / 2) * sy)::DOUBLE
               / NULLIF(n::DOUBLE * (n * (n + 1) * (2 * n + 1) / 6)
                  - (n * (n + 1) / 2)::DOUBLE
                    * (n * (n + 1) / 2)::DOUBLE, 0) AS b,
               sy::DOUBLE AS syd
        FROM stats
    ),
    ab AS (
        SELECT pri, n, v, b,
               (syd - b * (n * (n + 1) / 2)::DOUBLE) / n AS a
        FROM fit
    ),
    ses AS (
        SELECT pri, n, a, b,
               list_reduce(
                   list_prepend(
                       2 * v[1] - (a + b),
                       list_transform(range(2, n::INT + 1),
                           i -> 2 * v[i] - (a + b * i))),
                   (acc, z) -> (acc + z) / 2
               ) AS s
        FROM ab
    )
    SELECT pri,
           n AS n_days,
           CAST(ROUND(b::DECIMAL(28,12), 6) AS DOUBLE) + 0.0 AS slope,
           CAST(ROUND(a::DECIMAL(28,12), 6) AS DOUBLE) + 0.0 AS intercept,
           CAST(ROUND(s::DECIMAL(28,12), 6) AS DOUBLE) + 0.0 AS ses_level,
           CAST(ROUND((0.5 * (a + b * (n + 7)) + 0.5 * s)::DECIMAL(28,12),
                6) AS DOUBLE) + 0.0 AS forecast_7d
    FROM ses
    """,
)
def theta_forecast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta(0,2) forecast per order priority: OLS trend line + SES
    (alpha = 1/2, dyadic) over the theta=2 line, forecasting their
    average 7 days out.

    Scale: the fact-scale work is ONE map-side-combining (pri, day)
    aggregation; Sum(t), Sum(t^2) use closed integer forms, so only
    Sum(y) and Sum(y*t) touch data (exact DECIMAL, rule 1). The fold
    runs over the calendar-bounded per-priority series (~2.4k doubles)
    — metadata-sized at any corpus scale (holt_linear_q's rationale).
    """
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    wt = Window.partitionBy("pri").orderBy("day")
    idx = daily.select(
        "pri", "rev", F.row_number().over(wt).alias("t")
    )
    stats = idx.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("rev") * F.col("t")).alias("sty"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "rev"))),
            lambda s: s["rev"].cast("double"),
        ).alias("v"),
    )
    n = F.col("n")
    st = n * (n + 1) / 2  # Sum t    (integer-exact: n(n+1) is even)
    st2 = n * (n + 1) * (2 * n + 1) / 6  # Sum t^2
    # rule 8: an n=1 group has zero OLS denominator (the fit is
    # undefined) — NULLIF in both engines so the degenerate group emits
    # NULL fit columns instead of raising under ANSI
    b = (n * F.col("sty") - st * F.col("sy")).cast("double") / F.nullif(
        n.cast("double") * st2.cast("double")
        - st.cast("double") * st.cast("double"),
        F.lit(0.0),
    )
    ab = stats.select(
        "pri", "n", "v", b.alias("b"),
        (
            (F.col("sy").cast("double") - F.col("b") * st.cast("double")) / n
        ).alias("a"),
    )
    z = lambda i: 2 * F.element_at("v", i) - (  # noqa: E731
        F.col("a") + F.col("b") * i
    )
    # rule 14 guard: sequence(2, 1) DESCENDS when a priority has one
    # day — build 1..n (always ascending, n >= 1) and drop index 1, so
    # an n=1 group folds over an empty list exactly like DuckDB's
    # range(2, 2)
    s = F.aggregate(
        F.filter(
            F.sequence(F.lit(1), n.cast("int")), lambda i: i >= 2
        ),
        z(F.lit(1)),
        lambda acc, i: (acc + z(i)) / 2,
    )
    ses = ab.select("pri", "n", "a", "b", s.alias("s"))

    def dround(c):
        return F.round(c.cast("decimal(28,12)"), 6).cast("double") + F.lit(
            0.0
        )

    return ses.select(
        "pri",
        F.col("n").alias("n_days"),
        dround(F.col("b")).alias("slope"),
        dround(F.col("a")).alias("intercept"),
        dround(F.col("s")).alias("ses_level"),
        dround(
            0.5 * (F.col("a") + F.col("b") * (F.col("n") + 7))
            + 0.5 * F.col("s")
        ).alias("forecast_7d"),
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998) — the
# standard diversity pass over a retrieval shortlist: greedily pick the
# candidate maximizing lambda*rel(q,c) - (1-lambda)*max_{s in S} sim(c,s).
# The greedy loop is UNROLLED relationally (5 selection steps as plain
# join/window stages) rather than folded, so both engines run identical
# set-based arithmetic and DuckDB's struct-fold accumulator hazard
# (DETERMINISM rule 15) never enters; all similarities are rounded before
# any comparison (rule 12's total-order discipline, cid tiebreak).
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_K_CAND = 20
_MMR_K_PICK = 5


def _mmr_sql() -> str:
    steps = []
    for t in range(2, _MMR_K_PICK + 1):
        prev = f"sel{t - 1}"
        steps.append(
            f"""
    st{t} AS (
        SELECT c.query_id, c.cid, c.qsim, MAX(p.sim) AS pen
        FROM cand c
        JOIN {prev} s ON s.query_id = c.query_id
        JOIN pairs p ON p.query_id = c.query_id
             AND p.a_cid = c.cid AND p.b_cid = s.cid
        WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                          WHERE x.query_id = c.query_id
                            AND x.cid = c.cid)
        GROUP BY c.query_id, c.cid, c.qsim
    ),
    pick{t} AS (
        SELECT query_id, cid, qsim, pen,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY {_MMR_LAMBDA} * qsim
                            - {round(1 - _MMR_LAMBDA, 6)} * pen DESC,
                            cid) AS rn
        FROM st{t}
    ),
    sel{t} AS (
        SELECT query_id, cid, qsim, pick_order, pen FROM {prev}
        UNION ALL
        SELECT query_id, cid, qsim, {t} AS pick_order, pen
        FROM pick{t} WHERE rn = 1
    )"""
        )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cid,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS qsim
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 8
    ),
    cand AS (
        SELECT query_id, cid, qsim FROM (
            SELECT query_id, cid, qsim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY qsim DESC, cid) AS rn
            FROM scored) t
        WHERE rn <= {_MMR_K_CAND}
    ),
    pairs AS (
        SELECT a.query_id, a.cid AS a_cid, b.cid AS b_cid,
               ROUND(list_cosine_similarity(va.v, vb.v), 4) AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
        JOIN e va ON va.vec_id = a.cid
        JOIN e vb ON vb.vec_id = b.cid
    ),
    sel1 AS (
        SELECT query_id, cid, qsim, 1 AS pick_order, 0.0 AS pen
        FROM cand QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY qsim DESC, cid) = 1
    ),{",".join(steps)}
    SELECT query_id,
           pick_order::INT AS pick_order,
           cid AS neighbor_id,
           qsim AS relevance,
           CAST(ROUND(pen, 6) AS DOUBLE) + 0.0 AS diversity_penalty,
           CAST(ROUND({_MMR_LAMBDA} * qsim
                - {round(1 - _MMR_LAMBDA, 6)} * pen, 6) AS DOUBLE) + 0.0
               AS mmr_score
    FROM sel{_MMR_K_PICK}
    """


@register("mmr_rerank_q", _mmr_sql())
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 over each query's cosine top-20 shortlist
    (lambda = 0.7): relevance pulls toward the query, the penalty pushes
    away from what's already picked — the dedup-aware reranker a RAG
    retrieval stack runs after ANN.

    Scale: the shortlist stage is the knn_bruteforce plan (broadcast
    queries x corpus; at 100 TB the shortlist comes from the bucketed
    ANN instead — same downstream contract); everything after operates
    on k=20 rows per query (pairs = k^2 per query), so the 5 unrolled
    selection steps are metadata-scale joins/windows whatever the
    corpus size.
    """
    from iniz_exporters_spark.operators.similarity import cosine

    lam = F.lit(_MMR_LAMBDA)
    mu = F.lit(round(1 - _MMR_LAMBDA, 6))
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cid"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("qsim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cid")
    )
    # cand and pairs feed every unrolled selection step (4-5 consumers
    # each) — pin them so the shortlist scoring runs once, not per step
    # (the r10 multi-consumer-frame rule; localCheckpoint is the local[*]
    # analogue of persist-on-cluster)
    cand = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MMR_K_CAND)
        .select("query_id", "cid", "qsim")
        .transform(pin)
    )
    ev = e.select(F.col("vec_id").alias("cid"), "v")
    # broadcast the k*Q-row candidate side — ev is the CORPUS-scale
    # embeddings table and must never be the broadcast side (review fix:
    # the hint was inverted, which would collect the whole corpus onto
    # the driver at scale)
    cv = F.broadcast(cand).join(ev, "cid").select(
        "query_id", "cid", "qsim", "v"
    )
    a = cv.select(
        "query_id", F.col("cid").alias("a_cid"), F.col("v").alias("va")
    )
    b = cv.select(
        F.col("query_id").alias("qid_b"),
        F.col("cid").alias("b_cid"),
        F.col("v").alias("vb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("query_id") == F.col("qid_b"))
            & (F.col("a_cid") != F.col("b_cid")),
        )
        .select(
            "query_id", "a_cid", "b_cid",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .transform(pin)
    )
    sel = (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            "query_id", "cid", "qsim",
            F.lit(1).alias("pick_order"),
            F.lit(0.0).alias("pen"),
        )
    )
    for t in range(2, _MMR_K_PICK + 1):
        pen_t = (
            pairs.join(
                sel.select("query_id", F.col("cid").alias("b_cid")),
                ["query_id", "b_cid"],
            )
            .groupBy("query_id", "a_cid")
            .agg(F.max("sim").alias("pen"))
        )
        notsel = cand.join(
            sel.select("query_id", "cid"), ["query_id", "cid"], "left_anti"
        )
        scored_t = notsel.join(
            pen_t,
            (notsel["query_id"] == pen_t["query_id"])
            & (notsel["cid"] == pen_t["a_cid"]),
        ).select(notsel["query_id"], "cid", "qsim", "pen")
        wp = Window.partitionBy("query_id").orderBy(
            (lam * F.col("qsim") - mu * F.col("pen")).desc(), F.col("cid")
        )
        pick = (
            scored_t.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "cid", "qsim",
                F.lit(t).alias("pick_order"), "pen",
            )
        )
        # sel is read twice next iteration (penalty join + anti-join) and
        # its lineage otherwise re-runs every prior pick's window chain
        sel = sel.unionByName(pick).transform(pin)
    return sel.select(
        "query_id",
        F.col("pick_order").cast("int").alias("pick_order"),
        F.col("cid").alias("neighbor_id"),
        F.col("qsim").alias("relevance"),
        (F.round(F.col("pen"), 6) + F.lit(0.0)).alias("diversity_penalty"),
        (
            F.round(lam * F.col("qsim") - mu * F.col("pen"), 6) + F.lit(0.0)
        ).alias("mmr_score"),
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED member of the
# rank-test family next to mann_whitney_q (independent samples): does
# per-customer spend shift between the early (<=1994) and late (>=1995)
# halves of the order history? Ranks ride the same integral doubled-
# midrank machinery (avg_rank2_table over exact DECIMAL |d| keys), the
# tie-corrected normal approximation gets its one sqrt at the very end
# (IEEE-exact, not libm), and zero differences are dropped per the
# classical procedure (counted, so the emitted row shows the censoring;
# no continuity correction — documented choice, identical both engines).
# ---------------------------------------------------------------------------


@register(
    "wilcoxon_signed_rank_q",
    """
    WITH per AS (
        SELECT o_custkey,
               SUM(CASE WHEN year(o_orderdate) <= 1994
                   THEN o_totalprice::DECIMAL(18,4) ELSE 0 END) AS x,
               SUM(CASE WHEN year(o_orderdate) >= 1995
                   THEN o_totalprice::DECIMAL(18,4) ELSE 0 END) AS y
        FROM orders GROUP BY o_custkey
    ),
    d AS (SELECT y - x AS diff FROM per),
    nz AS (SELECT COUNT(*) AS n_zero FROM d WHERE diff = 0),
    tbl AS (
        SELECT abs(diff) AS ad, COUNT(*) AS cnt,
               SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS cnt_pos
        FROM d WHERE diff <> 0 GROUP BY abs(diff)
    ),
    ranked AS (
        SELECT cnt, cnt_pos,
               2 * SUM(cnt) OVER (ORDER BY ad) - cnt + 1 AS rank2
        FROM tbl
    ),
    agg AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt_pos * rank2) AS BIGINT) AS w2p,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie3
        FROM ranked
    )
    SELECT n AS n_pairs,
           (SELECT n_zero FROM nz)::BIGINT AS n_zero_dropped,
           CAST(w2p AS DOUBLE) / 2 AS w_plus,
           CAST(n * (n + 1) - w2p AS DOUBLE) / 2 AS w_minus,
           tie3 AS tie_correction,
           CAST(ROUND(
               (w2p - n * (n + 1) / 2.0)
               / (2.0 * sqrt(n * (n + 1) * (2 * n + 1) / 24.0
                             - tie3 / 48.0)), 6) AS DOUBLE) + 0.0
               AS z_score
    FROM agg
    """,
)
def wilcoxon_signed_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired early-vs-late spend shift per customer: W+ from doubled
    integral midranks over exact-decimal |d|, tie-corrected z.

    Scale: the fact-scale work is ONE map-side-combining per-customer
    aggregation; the midrank table has one row per DISTINCT |d| and its
    prefix count runs through global_cumsum (range-partitioned, no
    single-partition window); every compared value is integer until the
    final sqrt/divide (DETERMINISM rules 1/3/12).
    """
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    o = Catalog(spark, sf_dir).orders
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.year("o_orderdate") <= 1994, dec).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        ).alias("x"),
        F.sum(
            F.when(F.year("o_orderdate") >= 1995, dec).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        ).alias("y"),
    )
    # diff is read by the zero-counter AND the midrank table: pin so the
    # per-customer aggregation over orders runs once
    d = per.select(
        (F.col("y") - F.col("x")).alias("diff")
    ).transform(pin)
    nz = d.filter(F.col("diff") == 0).agg(
        F.count(F.lit(1)).alias("n_zero")
    )
    tbl = (
        d.filter(F.col("diff") != 0)
        .groupBy(F.abs(F.col("diff")).alias("ad"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias(
                "cnt_pos"
            ),
        )
    )
    ranked = avg_rank2_table(tbl, "ad")
    agg = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt_pos") * F.col("rank2")).cast("long").alias("w2p"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast("long").alias("tie3"),
    )
    n, w2p, tie3 = F.col("n"), F.col("w2p"), F.col("tie3")
    return agg.crossJoin(F.broadcast(nz)).select(
        n.alias("n_pairs"),
        F.col("n_zero").cast("long").alias("n_zero_dropped"),
        (w2p.cast("double") / 2).alias("w_plus"),
        ((n * (n + 1) - w2p).cast("double") / 2).alias("w_minus"),
        tie3.alias("tie_correction"),
        (
            F.round(
                (w2p - n * (n + 1) / F.lit(2.0))
                / (
                    F.lit(2.0)
                    * F.sqrt(
                        n * (n + 1) * (2 * n + 1) / F.lit(24.0)
                        - tie3 / F.lit(48.0)
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# NF4 (4-bit NormalFloat) quantization audit — the 4-bit member of the
# quantization family between int8_quantize_check (8-bit) and
# binary_quantize_recall_q (1-bit). Levels are the 16 published QLoRA
# constants (Dettmers et al. 2023, "QLoRA: Efficient Finetuning of
# Quantized LLMs", bitsandbytes reference values); each vector is
# absmax-normalized and every element snaps to the NEAREST level via a
# fixed midpoint CASE chain (ties at a midpoint take the lower level) —
# pure comparisons against shared decimal literals, no fold, so both
# engines pick identical codes without any rule-15 accumulator surface.
# ---------------------------------------------------------------------------

_NF4_LEVELS = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
_NF4_MIDPOINTS = tuple(
    (_NF4_LEVELS[i] + _NF4_LEVELS[i + 1]) / 2
    for i in range(len(_NF4_LEVELS) - 1)
)


def _nf4_case_sql(x: str) -> str:
    """Nearest-NF4-level CASE chain (SQL), generated from the one level
    table so Spark and DuckDB compare against byte-identical literals."""
    branches = "".join(
        f" WHEN {x} <= {m!r} THEN {l!r}"
        for m, l in zip(_NF4_MIDPOINTS, _NF4_LEVELS)
    )
    return f"CASE{branches} ELSE {_NF4_LEVELS[-1]!r} END"


def _nf4_nearest(x):
    out = F.lit(_NF4_LEVELS[-1])
    for m, lvl in reversed(list(zip(_NF4_MIDPOINTS, _NF4_LEVELS))):
        out = F.when(x <= F.lit(m), F.lit(lvl)).otherwise(out)
    return out


@register(
    "nf4_quantize_q",
    f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                   AS am
        FROM embeddings
    ),
    deq AS (
        SELECT vec_id, label, v, am,
               list_transform(v, x ->
                   CASE WHEN am = 0 THEN 0.0
                        ELSE {_nf4_case_sql("x / am")} * am END) AS w
        FROM e
    ),
    per AS (
        SELECT label,
               CAST(ROUND(list_reduce(
                   list_transform(range(1, len(v) + 1),
                       i -> (v[i] - w[i]) * (v[i] - w[i])),
                   (a, b) -> a + b) / len(v), 12) AS DECIMAL(20,12))
                   AS mse,
               CAST(ROUND(list_reduce(
                       list_transform(range(1, len(v) + 1),
                           i -> v[i] * w[i]), (a, b) -> a + b)
                   / (sqrt(list_reduce(list_transform(v, x -> x * x),
                           (a, b) -> a + b))
                      * sqrt(NULLIF(list_reduce(
                            list_transform(w, x -> x * x),
                            (a, b) -> a + b), 0))), 6)
                   AS DECIMAL(18,6)) AS cos
        FROM deq
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(ROUND(CAST(SUM(mse) AS DOUBLE) / COUNT(*), 9) AS DOUBLE)
               + 0.0 AS avg_mse,
           CAST(MAX(mse) AS DOUBLE) + 0.0 AS worst_mse,
           CAST(ROUND(CAST(SUM(cos) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               + 0.0 AS avg_cos
    FROM per GROUP BY label
    """,
)
def nf4_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label NF4 quantization error: absmax-normalize, snap to the
    16 QLoRA NormalFloat levels, dequantize, and report MSE / cosine
    fidelity against the original vectors.

    Scale: one corpus scan; every element's code comes from a 15-branch
    comparison chain inside whole-stage codegen (no per-element fold for
    the code choice); per-vector folds (MSE, dot) are d-bounded; the
    per-vector statistics quantize to DECIMAL before the per-label sum
    so group aggregation is partition-order-invariant (rules 1/6); one
    map-side-combining groupBy on label.
    """
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "am", F.array_max(F.transform("v", lambda x: F.abs(x)))
    )
    deq = e.withColumn(
        "w",
        F.transform(
            "v",
            lambda x: F.when(F.col("am") == 0, F.lit(0.0)).otherwise(
                _nf4_nearest(x / F.col("am")) * F.col("am")
            ),
        ),
    )
    sq_err = F.aggregate(
        F.zip_with("v", "w", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    dot = F.aggregate(
        F.zip_with("v", "w", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    n2 = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, t: a + t
    )
    per = deq.select(
        "label",
        F.round(sq_err / F.size("v"), 12).cast("decimal(20,12)").alias(
            "mse"
        ),
        F.round(
            dot / (F.sqrt(n2("v")) * F.sqrt(F.nullif(n2("w"), F.lit(0.0)))),
            6,
        ).cast("decimal(18,6)").alias("cos"),
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (
            F.round(F.sum("mse").cast("double") / F.count(F.lit(1)), 9)
            + F.lit(0.0)
        ).alias("avg_mse"),
        (F.max("mse").cast("double") + F.lit(0.0)).alias("worst_mse"),
        (
            F.round(F.sum("cos").cast("double") / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("avg_cos"),
    )


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning...", section 2.2) — the line-level companion to gopher_rules_q's
# doc-level thresholds: keep only lines that end in terminal punctuation
# and have >= 5 words, drop lines mentioning javascript, drop whole docs
# containing "lorem ipsum" or "{" or with < 3 surviving lines. The corpus
# is single-line word salad, so line structure and rule triggers are
# synthesized deterministically from doc_id (the established spike
# convention): lines of (7 + doc_id%5) tokens, terminal '.' on lines where
# (doc_id + line) % 3 != 0, and lorem/brace/javascript spikes on fixed
# residue classes. The RULES then re-detect everything from the
# constructed strings — they never read the spike conditions.
# ---------------------------------------------------------------------------


@register(
    "c4_rules_q",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS t,
               7 + doc_id % 5 AS lw
        FROM documents
    ),
    built AS (
        SELECT doc_id,
               len(t) AS ntok,
               CAST((len(t) + lw - 1) // lw AS INT) AS n_lines,
               list_transform(
                   range(0, CAST((len(t) + lw - 1) // lw AS INT)), i ->
                   array_to_string(t[i * lw + 1 : (i + 1) * lw], ' ')
                   || CASE WHEN doc_id % 41 = 0 AND i = 0
                           THEN ' lorem ipsum' ELSE '' END
                   || CASE WHEN doc_id % 37 = 0
                            AND i = 1 % CAST((len(t) + lw - 1) // lw AS INT)
                           THEN ' {' ELSE '' END
                   || CASE WHEN doc_id % 29 = 0
                            AND i = 2 % CAST((len(t) + lw - 1) // lw AS INT)
                           THEN ' javascript' ELSE '' END
                   || CASE WHEN (doc_id + i) % 3 <> 0
                           THEN '.' ELSE '' END
               ) AS lines
        FROM toks
    ),
    flags AS (
        SELECT doc_id, n_lines,
               len(list_filter(lines, l ->
                   right(l, 1) NOT IN ('.', '!', '?')))::INT
                   AS n_unpunct_lines,
               len(list_filter(lines, l ->
                   len(string_split(l, ' ')) < 5))::INT AS n_short_lines,
               len(list_filter(lines, l ->
                   contains(l, 'javascript')))::INT AS n_js_lines,
               len(list_filter(lines, l ->
                   right(l, 1) IN ('.', '!', '?')
                   AND len(string_split(l, ' ')) >= 5
                   AND NOT contains(l, 'javascript')))::INT
                   AS n_kept_lines,
               CASE WHEN len(list_filter(lines, l ->
                    contains(l, 'lorem ipsum'))) > 0 THEN 1 ELSE 0 END
                   AS has_lorem,
               CASE WHEN len(list_filter(lines, l ->
                    contains(l, '{'))) > 0 THEN 1 ELSE 0 END AS has_brace
        FROM built
    )
    SELECT doc_id, n_lines, n_kept_lines, n_unpunct_lines, n_short_lines,
           n_js_lines, has_lorem, has_brace,
           CASE WHEN n_kept_lines >= 3 AND has_lorem = 0 AND has_brace = 0
                THEN 1 ELSE 0 END AS doc_kept
    FROM flags
    """,
)
def c4_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line-level cleaning audit per document: terminal-punctuation
    and >=5-word line gates, javascript line drops, lorem-ipsum / brace
    doc drops, and the >=3-surviving-lines doc gate.

    Scale: one corpus scan; line construction and every rule are array
    expressions inside whole-stage codegen (no explode, zero shuffles),
    so cost is linear in tokens at any corpus size. Emits every doc
    with an integer doc_kept flag (DETERMINISM rule 11).
    """
    return c4_rule_flags(Catalog(spark, sf_dir).documents)


def c4_rule_flags(doc_frame: DataFrame) -> DataFrame:
    """DataFrame-level C4 rules transform (stateless per-row map);
    batch/stream agnostic — see the streaming parity test."""
    from iniz_exporters_spark.functions.text import tokens

    d = doc_frame.select(
        "doc_id", tokens("text").alias("t"),
        (7 + F.col("doc_id") % 5).alias("lw"),
    )
    ntok = F.size("t")
    n_lines = F.floor((ntok + F.col("lw") - 1) / F.col("lw")).cast("int")
    built = d.select(
        "doc_id",
        n_lines.alias("n_lines"),
        # rule 14 guard: sequence(0, -1) DESCENDS for zero-token docs
        # (and 1 % 0 raises under ANSI) — emit an empty line array like
        # DuckDB's range(0, 0) does
        F.when(
            ntok == 0, F.array().cast("array<string>")
        ).otherwise(F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat(
                F.array_join(
                    F.slice(
                        F.col("t"),
                        i * F.col("lw") + 1,
                        F.col("lw"),
                    ),
                    " ",
                ),
                F.when(
                    (F.col("doc_id") % 41 == 0) & (i == 0),
                    F.lit(" lorem ipsum"),
                ).otherwise(""),
                F.when(
                    (F.col("doc_id") % 37 == 0)
                    & (i == 1 % n_lines.cast("bigint")),
                    F.lit(" {"),
                ).otherwise(""),
                F.when(
                    (F.col("doc_id") % 29 == 0)
                    & (i == 2 % n_lines.cast("bigint")),
                    F.lit(" javascript"),
                ).otherwise(""),
                F.when(
                    (F.col("doc_id") + i) % 3 != 0, F.lit(".")
                ).otherwise(""),
            ),
        )).alias("lines"),
    )
    term = lambda l: F.substring(l, -1, 1).isin(".", "!", "?")  # noqa: E731
    words = lambda l: F.size(F.split(l, " "))  # noqa: E731
    nflt = lambda pred: F.size(  # noqa: E731
        F.filter(F.col("lines"), pred)
    ).cast("int")
    flags = built.select(
        "doc_id", "n_lines",
        nflt(lambda l: ~term(l)).alias("n_unpunct_lines"),
        nflt(lambda l: words(l) < 5).alias("n_short_lines"),
        nflt(lambda l: l.contains("javascript")).alias("n_js_lines"),
        nflt(
            lambda l: term(l)
            & (words(l) >= 5)
            & ~l.contains("javascript")
        ).alias("n_kept_lines"),
        F.when(
            F.size(F.filter(F.col("lines"), lambda l: l.contains(
                "lorem ipsum"))) > 0, 1
        ).otherwise(0).alias("has_lorem"),
        F.when(
            F.size(F.filter(F.col("lines"), lambda l: l.contains("{")))
            > 0, 1
        ).otherwise(0).alias("has_brace"),
    )
    return flags.select(
        "*",
        F.when(
            (F.col("n_kept_lines") >= 3)
            & (F.col("has_lorem") == 0)
            & (F.col("has_brace") == 0),
            1,
        ).otherwise(0).alias("doc_kept"),
    )


# ---------------------------------------------------------------------------
# UniMax sampling allocation (Chung et al. 2023, "UniMax: Fairer and More
# Effective Language Sampling for Large-Scale Multilingual Pretraining"):
# spread a token budget across sources as uniformly as possible subject to
# a per-source epoch cap. The waterfilling level is found RELATIONALLY:
# caps sorted ascending, and the saturated prefix k is the largest rank
# whose cap fits under its candidate level — the test is the integer
# cross-multiplication c_k * (n-k) <= B - P_k, so level selection never
# touches a double (DETERMINISM rule 3); the single division producing
# the level happens once, at the sink. Per-source epoch caps vary
# deterministically (1 + suffix % 3) so both the saturated and
# level-bound branches are exercised at every scale.
# ---------------------------------------------------------------------------


@register(
    "unimax_alloc_q",
    """
    WITH src AS (
        SELECT source,
               CAST(SUM(len(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''))) AS BIGINT) AS n_tokens,
               (1 + CAST(substr(source, 4) AS BIGINT) % 3) AS epoch_cap
        FROM documents GROUP BY source
    ),
    capped AS (
        SELECT source, n_tokens, epoch_cap,
               n_tokens * epoch_cap AS cap_tokens
        FROM src
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_tokens) AS BIGINT) AS total,
               CAST(6 * SUM(n_tokens) // 5 AS BIGINT) AS budget
        FROM capped
    ),
    ranked AS (
        SELECT source, n_tokens, epoch_cap, cap_tokens,
               ROW_NUMBER() OVER (ORDER BY cap_tokens, source) AS rn,
               SUM(cap_tokens) OVER (ORDER BY cap_tokens, source) AS pref
        FROM capped
    ),
    ksel AS (
        SELECT COALESCE(MAX(rn), 0) AS k
        FROM ranked, tot
        WHERE cap_tokens * (n - rn) <= budget - pref
    )
    SELECT r.source, r.n_tokens, r.epoch_cap::INT AS epoch_cap,
           r.cap_tokens,
           CASE WHEN r.rn <= k.k THEN 1 ELSE 0 END AS saturated,
           CAST(ROUND(CASE WHEN r.rn <= k.k THEN CAST(r.cap_tokens AS
                     DOUBLE)
                ELSE (t.budget - COALESCE(
                        (SELECT pref FROM ranked p WHERE p.rn = k.k), 0)
                     )::DOUBLE / (t.n - k.k) END, 2) AS DOUBLE) + 0.0
               AS alloc_tokens,
           CAST(ROUND(CASE WHEN r.rn <= k.k THEN CAST(r.cap_tokens AS
                     DOUBLE)
                ELSE (t.budget - COALESCE(
                        (SELECT pref FROM ranked p WHERE p.rn = k.k), 0)
                     )::DOUBLE / (t.n - k.k) END
                / r.n_tokens, 6) AS DOUBLE) + 0.0 AS epochs,
           t.budget AS budget_tokens
    FROM ranked r, tot t, ksel k
    """,
)
def unimax_alloc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax waterfilling: allocate a 1.2-epoch token budget across
    sources as uniformly as the per-source epoch caps allow — small-cap
    sources saturate, the rest share the remaining budget at one common
    level.

    Scale: the fact-scale work is ONE map-side-combining per-source
    aggregation; everything after runs on the source table (metadata-
    scale at any corpus size — same rationale as mixture_domain_weights).
    Saturation is decided by integer cross-multiplication; the level's
    single division happens at the sink.
    """
    from iniz_exporters_spark.functions.text import tokens

    d = Catalog(spark, sf_dir).documents
    src = d.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens")
    ).withColumn(
        "epoch_cap",
        1 + F.substring("source", 4, 10).cast("long") % 3,
    ).withColumn(
        "cap_tokens", F.col("n_tokens") * F.col("epoch_cap")
    ).transform(pin)  # read by tot AND ranked: one
    # corpus-scale tokenize+agg, not two
    tot = src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_tokens").cast("long").alias("total"),
        F.floor(6 * F.sum("n_tokens") / 5).cast("long").alias("budget"),
    )
    wr = Window.orderBy("cap_tokens", "source")
    ranked = src.select(
        "source", "n_tokens", "epoch_cap", "cap_tokens",
        F.row_number().over(wr).alias("rn"),
        F.sum("cap_tokens").over(wr).alias("pref"),
    ).crossJoin(F.broadcast(tot))
    kfrm = ranked.filter(
        F.col("cap_tokens") * (F.col("n") - F.col("rn"))
        <= F.col("budget") - F.col("pref")
    ).agg(F.coalesce(F.max("rn"), F.lit(0)).alias("k"))
    withk = ranked.crossJoin(F.broadcast(kfrm))
    # P_k = prefix sum at rank k: pref is monotone in rn, so the max of
    # pref over the saturated prefix IS P_k (0 when k = 0); the window
    # spans the metadata-scale source table only
    wall = Window.partitionBy(F.lit(1))
    withk = withk.withColumn(
        "pk_all",
        F.max(
            F.when(F.col("rn") <= F.col("k"), F.col("pref")).otherwise(
                F.lit(0).cast("long")
            )
        ).over(wall),
    )
    level = (F.col("budget") - F.col("pk_all")).cast("double") / (
        F.col("n") - F.col("k")
    )
    alloc = F.when(
        F.col("rn") <= F.col("k"), F.col("cap_tokens").cast("double")
    ).otherwise(level)
    return withk.select(
        "source", "n_tokens",
        F.col("epoch_cap").cast("int").alias("epoch_cap"),
        "cap_tokens",
        F.when(F.col("rn") <= F.col("k"), 1).otherwise(0).alias(
            "saturated"
        ),
        (F.round(alloc, 2) + F.lit(0.0)).alias("alloc_tokens"),
        (F.round(alloc / F.col("n_tokens"), 6) + F.lit(0.0)).alias(
            "epochs"
        ),
        F.col("budget").alias("budget_tokens"),
    )


# ---------------------------------------------------------------------------
# Pipeline waterfall audit — the observability face of
# pipeline_clean_corpus: how many documents each cleaning stage admits
# (quality gate -> language gate -> exact dedup -> near-dup), as one row
# per stage with in/out/drop-rate. Counting is ONE conditional aggregate
# over the scored corpus (stage predicates are cumulative, so the first
# three stages are count_if's of the same scan and exact-dedup survivors
# are COUNT(DISTINCT text) among passers) plus the near-dup candidate
# machinery pipeline_clean_corpus already runs — no per-stage rescans.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.queries.p01 import (  # noqa: E402
    _SQL_TOKENS as _P01_TOKENS,
    _sql_minhash_sigs as _p01_minhash_sigs,
)


@register(
    "pipeline_waterfall_q",
    f"""
    WITH t0 AS (
        SELECT doc_id, text, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_P01_TOKENS} AS toks
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
        JOIN (SELECT text, MIN(doc_id) AS keep FROM filtered
              GROUP BY text) k
          ON f.text = k.text AND f.doc_id = k.keep
    ),
    {_p01_minhash_sigs(16, table="exact")},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
    ),
    dropped AS (
        SELECT DISTINCT id_b FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
        WHERE ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                    / (len(ha.hs) + len(hb.hs)
                       - len(list_intersect(ha.hs, hb.hs))), 4) >= 0.7
    ),
    counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS c0,
               CAST(COUNT(*) FILTER (quality >= 0.5) AS BIGINT) AS cq,
               CAST(COUNT(*) FILTER (quality >= 0.5
                    AND greatest(c_en, c_es, c_de, c_fr) > 0
                    AND c_en = greatest(c_en, c_es, c_de, c_fr))
                    AS BIGINT) AS cl,
               CAST(COUNT(DISTINCT CASE WHEN quality >= 0.5
                    AND greatest(c_en, c_es, c_de, c_fr) > 0
                    AND c_en = greatest(c_en, c_es, c_de, c_fr)
                    THEN text END) AS BIGINT) AS ce
        FROM scored
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM dropped),
    stages(stage, n_in, n_out) AS (
        SELECT '1_quality', c0, cq FROM counts
        UNION ALL SELECT '2_language', cq, cl FROM counts
        UNION ALL SELECT '3_exact_dedup', cl, ce FROM counts
        UNION ALL SELECT '4_near_dedup', ce, ce - d FROM counts, nd
    )
    SELECT stage, n_in, n_out, n_in - n_out AS n_dropped,
           CAST(ROUND((n_in - n_out)::DOUBLE / NULLIF(n_in, 0), 6)
                AS DOUBLE) + 0.0 AS drop_rate
    FROM stages
    """,
)
def pipeline_waterfall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where do documents die in the cleaning pipeline? One row per
    stage (quality, language, exact dedup, near-dup) with admitted
    counts and drop rates — the run-report a 100 TB curation job emits
    beside its output.

    Scale: the first three stage counts and the exact-dedup survivor
    count come from ONE conditional aggregate over the scored corpus
    (no per-stage rescans; COUNT(DISTINCT text) is the keep-first
    cardinality without materializing winners); the near-dup stage
    reuses pipeline_clean_corpus's banded-LSH candidate plan, which
    never goes all-pairs.
    """
    from iniz_exporters_spark.functions.text import text_stats
    from iniz_exporters_spark.operators.dedup import (
        dedup_exact,
        neardup_pairs,
    )

    d = Catalog(spark, sf_dir).documents
    # r14-opt: carry_text=True removes the join(d, doc_id) text
    # re-attach (guide §8's attach rule — at 100 TB that join shuffles
    # the text payload), and the pin stops the kernel re-running once
    # per consumer: scored feeds the counts aggregate AND dedup_exact's
    # two reads (keep-agg + semi-join) — THREE kernel evaluations
    # before this change.
    scored = (
        text_stats(d, "doc_id", "text", carry_text=True)
        .select(
            "doc_id",
            "text",
            F.round(F.col("quality_raw").cast("decimal(28,12)"), 4)
            .cast("double")
            .alias("quality"),
            "lang_pred",
        )
        .transform(pin)
    )
    gate = (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
    counts = scored.agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        F.sum(F.when(F.col("quality") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("cq"),
        F.sum(F.when(gate, 1).otherwise(0)).cast("long").alias("cl"),
        F.count_distinct(F.when(gate, F.col("text"))).cast("long").alias(
            "ce"
        ),
    )
    filtered = scored.filter(gate).select("doc_id", "text", "quality")
    exact = dedup_exact(filtered, ["text"], "doc_id").transform(pin)
    nd = (
        neardup_pairs(
            exact, "doc_id", "text", threshold=0.7, num_perm=16,
            rows_per_band=4,
        )
        .select("id_b")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    both = counts.crossJoin(F.broadcast(nd))
    stage = F.explode(
        F.array(
            F.struct(
                F.lit("1_quality").alias("stage"),
                F.col("c0").alias("n_in"),
                F.col("cq").alias("n_out"),
            ),
            F.struct(
                F.lit("2_language").alias("stage"),
                F.col("cq").alias("n_in"),
                F.col("cl").alias("n_out"),
            ),
            F.struct(
                F.lit("3_exact_dedup").alias("stage"),
                F.col("cl").alias("n_in"),
                F.col("ce").alias("n_out"),
            ),
            F.struct(
                F.lit("4_near_dedup").alias("stage"),
                F.col("ce").alias("n_in"),
                (F.col("ce") - F.col("d")).alias("n_out"),
            ),
        )
    )
    rows = both.select(stage.alias("s")).select(
        "s.stage", "s.n_in", "s.n_out"
    )
    return rows.select(
        "stage", "n_in", "n_out",
        (F.col("n_in") - F.col("n_out")).alias("n_dropped"),
        (
            F.round(
                (F.col("n_in") - F.col("n_out")).cast("double")
                / F.nullif(F.col("n_in"), F.lit(0)),
                6,
            )
            + F.lit(0.0)
        ).alias("drop_rate"),
    )


# ---------------------------------------------------------------------------
# Group-fairness audit (demographic parity + equalized odds; Hardt et al.
# 2016, "Equality of Opportunity in Supervised Learning"): score a cheap
# deterministic "model" (order count above the global mean) against a
# ground-truth label (spend above the global mean) and report, per market
# segment, the selection rate, TPR and FPR, and each group's gap to the
# overall rate. All rates are ratios of exact integer counts (decimal
# spend sums; mean comparisons via integer cross-multiplication so no
# double enters a decision), divided once at the sink.
# ---------------------------------------------------------------------------


@register(
    "fairness_parity_q",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(o_totalprice::DECIMAL(18,4)) AS spend
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nc,
               CAST(SUM(n_orders) AS BIGINT) AS so,
               SUM(spend) AS ss
        FROM per
    ),
    scored AS (
        -- x > mean  <=>  x * n_customers > total  (integer/decimal exact)
        SELECT c.c_mktsegment AS segment,
               CASE WHEN p.spend * t.nc > t.ss THEN 1 ELSE 0 END AS label,
               CASE WHEN p.n_orders * t.nc > t.so THEN 1 ELSE 0 END
                   AS pred
        FROM per p JOIN customer c ON c.c_custkey = p.o_custkey, tot t
    ),
    grp AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pred) AS BIGINT) AS n_pred,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN pred = 1 AND label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
               CAST(SUM(CASE WHEN pred = 1 AND label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
        FROM scored GROUP BY segment
    ),
    ov AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(n_pred) AS BIGINT) AS n_pred,
               CAST(SUM(n_pos) AS BIGINT) AS n_pos,
               CAST(SUM(n_tp) AS BIGINT) AS n_tp,
               CAST(SUM(n_fp) AS BIGINT) AS n_fp
        FROM grp
    )
    SELECT g.segment,
           g.n AS n_customers,
           CAST(ROUND(g.n_pos::DOUBLE / g.n, 6) AS DOUBLE) + 0.0
               AS base_rate,
           CAST(ROUND(g.n_pred::DOUBLE / g.n, 6) AS DOUBLE) + 0.0
               AS selection_rate,
           CAST(ROUND(g.n_tp::DOUBLE / NULLIF(g.n_pos, 0), 6) AS DOUBLE)
               + 0.0 AS tpr,
           CAST(ROUND(g.n_fp::DOUBLE / NULLIF(g.n - g.n_pos, 0), 6)
               AS DOUBLE) + 0.0 AS fpr,
           CAST(ROUND(abs(g.n_pred::DOUBLE / g.n
                - o.n_pred::DOUBLE / o.n), 6) AS DOUBLE) + 0.0 AS dp_gap,
           CAST(ROUND(abs(g.n_tp::DOUBLE / NULLIF(g.n_pos, 0)
                - o.n_tp::DOUBLE / NULLIF(o.n_pos, 0)), 6) AS DOUBLE)
               + 0.0 AS eo_gap
    FROM grp g, ov o
    """,
)
def fairness_parity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment fairness audit of a deterministic selection rule:
    demographic-parity gap (selection rate vs overall) and
    equal-opportunity gap (TPR vs overall), plus base rate and FPR.

    Scale: fact-scale work is ONE per-customer aggregation over orders;
    the segment join broadcasts the customer dim; every decision
    (label, prediction) is an integer cross-multiplication against
    exact decimal/integer totals, so no double reaches a boolean; the
    per-segment rollup is metadata-scale. NULLIF guards segments
    without positives (rule 8).
    """
    cat = Catalog(spark, sf_dir)
    per = cat.orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("n_orders").cast("long").alias("so"),
        F.sum("spend").alias("ss"),
    )
    cust = cat.customer.select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    scored = (
        per.join(F.broadcast(cust), per["o_custkey"] == cust["c_custkey"])
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.when(
                F.col("spend") * F.col("nc") > F.col("ss"), 1
            ).otherwise(0).alias("label"),
            F.when(
                F.col("n_orders") * F.col("nc") > F.col("so"), 1
            ).otherwise(0).alias("pred"),
        )
    )
    grp = scored.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pred").cast("long").alias("n_pred"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(
            F.when((F.col("pred") == 1) & (F.col("label") == 1), 1)
            .otherwise(0)
        ).cast("long").alias("n_tp"),
        F.sum(
            F.when((F.col("pred") == 1) & (F.col("label") == 0), 1)
            .otherwise(0)
        ).cast("long").alias("n_fp"),
    ).transform(pin)  # read again by the overall rollup
    ov = grp.agg(
        F.sum("n").cast("long").alias("o_n"),
        F.sum("n_pred").cast("long").alias("o_pred"),
        F.sum("n_pos").cast("long").alias("o_pos"),
        F.sum("n_tp").cast("long").alias("o_tp"),
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return grp.crossJoin(F.broadcast(ov)).select(
        "segment",
        F.col("n").alias("n_customers"),
        r6(F.col("n_pos").cast("double") / F.col("n")).alias("base_rate"),
        r6(F.col("n_pred").cast("double") / F.col("n")).alias(
            "selection_rate"
        ),
        r6(
            F.col("n_tp").cast("double") / F.nullif(F.col("n_pos"), F.lit(0))
        ).alias("tpr"),
        r6(
            F.col("n_fp").cast("double")
            / F.nullif(F.col("n") - F.col("n_pos"), F.lit(0))
        ).alias("fpr"),
        r6(
            F.abs(
                F.col("n_pred").cast("double") / F.col("n")
                - F.col("o_pred").cast("double") / F.col("o_n")
            )
        ).alias("dp_gap"),
        r6(
            F.abs(
                F.col("n_tp").cast("double")
                / F.nullif(F.col("n_pos"), F.lit(0))
                - F.col("o_tp").cast("double")
                / F.nullif(F.col("o_pos"), F.lit(0))
            )
        ).alias("eo_gap"),
    )


# ---------------------------------------------------------------------------
# LSH S-curve audit (Leskovec/Rajaraman/Ullman, "Mining of Massive
# Datasets" ch. 3): with b=4 bands of r=4 rows, theory says a pair with
# true Jaccard J becomes a candidate with probability 1 - (1 - J^4)^4.
# This query measures the EMPIRICAL candidate rate of the deployed
# banding against that curve, binned by exact Jaccard — the calibration
# check that tells you whether the dedup pipeline's recall at its 0.7
# threshold is what the theory promised. Pairs come from a deterministic
# doc_id sample (at corpus scale the audit always runs on a fixed-size
# sample; the exact-J stage is quadratic IN THE SAMPLE only). The
# theoretical curve is a pure polynomial — no libm — and per-pair values
# quantize to DECIMAL before the per-bin mean (rule 1); the bin key is
# integer division, never ROUND(double) (rule 3).
# ---------------------------------------------------------------------------


@register(
    "lsh_scurve_q",
    f"""
    WITH sample AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
    ),
    {_p01_minhash_sigs(16, table="sample")},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT ha.doc_id AS id_a, hb.doc_id AS id_b,
               len(list_intersect(ha.hs, hb.hs)) AS i_sz,
               len(ha.hs) + len(hb.hs)
                   - len(list_intersect(ha.hs, hb.hs)) AS u_sz
        FROM sh ha JOIN sh hb ON ha.doc_id < hb.doc_id
    ),
    scored AS (
        SELECT (10 * i_sz) // u_sz AS jbin,
               CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS is_cand,
               CAST(ROUND(1 - power(1 - power(i_sz::DOUBLE / u_sz, 4), 4),
                    12) AS DECIMAL(16,12)) AS p_theory
        FROM pairs p
        LEFT JOIN cand c ON p.id_a = c.id_a AND p.id_b = c.id_b
    )
    SELECT CAST(jbin AS INT) AS jbin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
           CAST(ROUND(SUM(is_cand)::DOUBLE / COUNT(*), 6) AS DOUBLE)
               + 0.0 AS empirical_rate,
           CAST(ROUND(CAST(SUM(p_theory) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) + 0.0 AS theoretical_rate
    FROM scored GROUP BY jbin
    """,
)
def lsh_scurve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the deployed 4x4 banding hit its theoretical S-curve? Per
    exact-Jaccard bin: empirical candidate rate vs the polynomial
    1-(1-J^4)^4 averaged over the bin's pairs.

    Scale: exact Jaccard is quadratic only in the FIXED doc_id sample
    (the production audit shape); candidate generation reuses the
    bucketed LSH pass (never all-pairs over the corpus); the bin key is
    pure integer division and the theory values quantize to decimal
    before the bin mean. power() here is integer-exponent
    multiplication in both engines, not libm pow-of-arbitrary-base.
    """
    from iniz_exporters_spark.operators.dedup import (
        band_rows,
        candidate_pairs,
        shingle_band_sets,
    )

    d = Catalog(spark, sf_dir).documents.filter(
        F.col("doc_id") % 10 == 0
    ).select("doc_id", "text")
    # r15: one fused shingle+band Arrow pass (values bit-identical to the
    # separate kernels); candidate_pairs self-joins the JVM-side band
    # explode of the same pinned frame.
    hs = shingle_band_sets(d, "doc_id", "text", 5, 16, 4).transform(pin)
    cand = candidate_pairs(band_rows(hs, "doc_id"), "doc_id").withColumn(
        "is_c", F.lit(1)
    )
    ha = hs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    hb = hs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    pairs = (
        ha.join(hb, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            inter.cast("long").alias("i_sz"),
            (F.size("hs_a") + F.size("hs_b") - inter).cast("long").alias(
                "u_sz"
            ),
        )
    )
    j = F.col("i_sz").cast("double") / F.col("u_sz")
    j4 = j * j * j * j
    m = 1 - j4
    p_theory = F.round(1 - m * m * m * m, 12).cast("decimal(16,12)")
    scored = (
        pairs.join(F.broadcast(cand), ["id_a", "id_b"], "left")
        .select(
            F.expr("(10 * i_sz) div u_sz").cast("int").alias("jbin"),
            F.coalesce(F.col("is_c"), F.lit(0)).alias("is_cand"),
            p_theory.alias("p_theory"),
        )
    )
    return scored.groupBy("jbin").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        (
            F.round(
                F.sum("is_cand").cast("double") / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("empirical_rate"),
        (
            F.round(
                F.sum("p_theory").cast("double") / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("theoretical_rate"),
    )


# ---------------------------------------------------------------------------
# k-center coreset selection (Gonzalez 1985 farthest-point traversal) —
# the diversity-sampling primitive data-selection pipelines use to pick
# representative exemplars: seed with the smallest vec_id, then greedily
# take the point FARTHEST from everything selected so far. Five unrolled
# selection steps, each ONE linear pass over the corpus (distance to the
# single new center + running min) — the construction is O(k·n), never
# quadratic, which is exactly why this algorithm is the standard coreset
# builder at scale. Distances are the same rounded sequential-fold
# squared-euclidean both engines share (knn_loo's contract); ties break
# on vec_id (rule 12).
# ---------------------------------------------------------------------------

_KC_PICKS = 5

_SQL_D2 = (
    "ROUND(list_reduce(list_transform(range(1, len({a}) + 1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y), 6)"
)


def _kcenter_sql() -> str:
    steps = []
    for t in range(2, _KC_PICKS + 1):
        prev_m = f"m{t - 1}"
        steps.append(f"""
    p{t} AS (
        SELECT vec_id, v, mind FROM {prev_m}
        ORDER BY mind DESC, vec_id LIMIT 1
    ),
    m{t} AS (
        SELECT m.vec_id, m.v,
               least(m.mind, {_SQL_D2.format(a="m.v", b="p.v")}) AS mind
        FROM {prev_m} m, p{t} p WHERE m.vec_id <> p.vec_id
    )""")
        # final step needs no m{_KC_PICKS}; harmless to build it anyway
    picks = "\n    UNION ALL ".join(
        f"SELECT {t} AS pick_order, vec_id, "
        f"CAST(mind AS DOUBLE) + 0.0 AS radius FROM p{t}"
        for t in range(2, _KC_PICKS + 1)
    )
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
    m1 AS (
        SELECT e.vec_id, e.v,
               {_SQL_D2.format(a="e.v", b="c.v")} AS mind
        FROM e, c1 c WHERE e.vec_id <> c.vec_id
    ),{",".join(steps)}
    SELECT pick_order::INT AS pick_order, vec_id, radius FROM (
        SELECT 1 AS pick_order, vec_id, 0.0 AS radius FROM c1
        UNION ALL {picks}
    ) t
    """


@register("kcenter_coreset_q", _kcenter_sql())
def kcenter_coreset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-exemplar farthest-point coreset over the embedding corpus:
    each pick is the point maximizing its distance to the already-
    selected set; radius records that max-min distance (the k-center
    coverage radius achieved as each exemplar lands).

    Scale: k unrolled steps, each a linear corpus pass (distance to ONE
    broadcast center + running min, then a single ordered pick) — the
    O(k·n) construction; the running-min frame is pinned per step so
    step t never re-runs steps 1..t-1.
    """
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def d2(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )

    c1 = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    m = (
        e.crossJoin(F.broadcast(c1))
        .filter(F.col("vec_id") != F.col("c_id"))
        .select("vec_id", "v", d2(F.col("v"), F.col("cv")).alias("mind"))
        .transform(pin)
    )
    out = c1.select(
        F.lit(1).alias("pick_order"),
        F.col("c_id").alias("vec_id"),
        F.lit(0.0).alias("radius"),
    )
    for t in range(2, _KC_PICKS + 1):
        pick = m.orderBy(F.col("mind").desc(), F.col("vec_id")).limit(1)
        out = out.unionByName(
            pick.select(
                F.lit(t).alias("pick_order"),
                "vec_id",
                (F.col("mind") + F.lit(0.0)).alias("radius"),
            )
        )
        if t < _KC_PICKS:
            c = pick.select(
                F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
            )
            m = (
                m.crossJoin(F.broadcast(c))
                .filter(F.col("vec_id") != F.col("c_id"))
                .select(
                    "vec_id", "v",
                    F.least(
                        F.col("mind"), d2(F.col("v"), F.col("cv"))
                    ).alias("mind"),
                )
                .transform(pin)
            )
    return out.select(
        F.col("pick_order").cast("int").alias("pick_order"),
        "vec_id",
        "radius",
    )


# ---------------------------------------------------------------------------
# Duplication growth curve — how fast does duplication accumulate as the
# corpus grows? For nested doc_id prefixes (1/4, 1/2, 3/4, full), report
# the exact-duplicate rate on the bag-of-words fingerprint. The key
# observation making this ONE pass: prefixes nest, so "doc is a dup
# within prefix P" == "some EARLIER doc shares its fingerprint" — a
# property of the doc alone (first-occurrence test), independent of P.
# One min-owner window over fingerprints, then cumulative counts per
# quartile tier. The curve is what tells a curation planner whether
# dedup savings grow or saturate at 10x the corpus.
# ---------------------------------------------------------------------------


@register(
    "dup_growth_curve_q",
    f"""
    WITH d AS (
        SELECT doc_id,
               {_MIRROR_FP_SQL} AS fp
        FROM documents
    ),
    owned AS (
        SELECT doc_id,
               CASE WHEN MIN(doc_id) OVER (PARTITION BY fp) < doc_id
                    THEN 1 ELSE 0 END AS is_dup
        FROM d
    ),
    mx AS (SELECT MAX(doc_id) + 1 AS n FROM owned),
    tiered AS (
        SELECT CASE
                 WHEN doc_id * 4 < (SELECT n FROM mx) THEN 1
                 WHEN doc_id * 2 < (SELECT n FROM mx) THEN 2
                 WHEN doc_id * 4 < 3 * (SELECT n FROM mx) THEN 3
                 ELSE 4 END AS tier,
               is_dup
        FROM owned
    ),
    per AS (
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_tier,
               CAST(SUM(is_dup) AS BIGINT) AS d_tier
        FROM tiered GROUP BY tier
    ),
    cum AS (
        SELECT tier,
               SUM(n_tier) OVER (ORDER BY tier) AS n_docs,
               SUM(d_tier) OVER (ORDER BY tier) AS n_dups
        FROM per
    )
    SELECT CAST(tier AS INT) AS prefix_quartile,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_dups AS BIGINT) AS n_dups,
           CAST(ROUND(n_dups::DOUBLE / n_docs, 6) AS DOUBLE) + 0.0
               AS dup_rate
    FROM cum
    """,
)
def dup_growth_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate at nested corpus prefixes (quartiles of the
    doc_id range): does duplication accumulate linearly or saturate as
    the corpus grows — the measurement behind a dedup capacity plan.

    Scale: one corpus scan + ONE min-owner window keyed on the
    fingerprint (the bff_dedup owner-resolution shape — a single
    exchange); tier assignment is integer cross-multiplication; the
    quartile rollup and its running sums are 4-row metadata.
    """
    from iniz_exporters_spark.functions.text import poly_hash, tokens

    bow = F.array_join(
        F.array_sort(F.array_distinct(tokens("text"))), " "
    )
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", poly_hash(bow).alias("fp")
    )
    wfp = Window.partitionBy("fp")
    owned = d.select(
        "doc_id",
        F.when(F.min("doc_id").over(wfp) < F.col("doc_id"), 1)
        .otherwise(0)
        .alias("is_dup"),
    )
    mx = owned.agg((F.max("doc_id") + 1).alias("n"))
    tier = (
        F.when(F.col("doc_id") * 4 < F.col("n"), 1)
        .when(F.col("doc_id") * 2 < F.col("n"), 2)
        .when(F.col("doc_id") * 4 < 3 * F.col("n"), 3)
        .otherwise(4)
    )
    per = (
        owned.crossJoin(F.broadcast(mx))
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tier"),
            F.sum("is_dup").cast("long").alias("d_tier"),
        )
    )
    wt = Window.orderBy("tier")
    cum = per.select(
        "tier",
        F.sum("n_tier").over(wt).alias("n_docs"),
        F.sum("d_tier").over(wt).alias("n_dups"),
    )
    return cum.select(
        F.col("tier").cast("int").alias("prefix_quartile"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_dups").cast("long").alias("n_dups"),
        (
            F.round(F.col("n_dups").cast("double") / F.col("n_docs"), 6)
            + F.lit(0.0)
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# SoftDeDup sampling weights — instead of DROPPING duplicates, reweight
# them: every doc in a duplicate group of size g trains with weight 1/g,
# so the group contributes one document's worth of gradient in
# expectation (the soft alternative to keep-first dedup). Group identity
# is the bag-of-words fingerprint (host_mirror's key). Weights are exact
# rationals (1/g) rounded once at the sink; the expected effective
# corpus size Sum(1/g over docs) = count of distinct groups — pinned by
# the bruteforce replica as a conservation law.
# ---------------------------------------------------------------------------


@register(
    "softdedup_weights_q",
    f"""
    WITH d AS (
        SELECT doc_id, {_MIRROR_FP_SQL} AS fp FROM documents
    ),
    g AS (
        SELECT doc_id, fp,
               COUNT(*) OVER (PARTITION BY fp) AS group_size,
               MIN(doc_id) OVER (PARTITION BY fp) AS group_owner
        FROM d
    )
    SELECT doc_id,
           CAST(group_size AS BIGINT) AS group_size,
           group_owner,
           CASE WHEN doc_id = group_owner THEN 1 ELSE 0 END AS is_owner,
           CAST(ROUND(1.0 / group_size, 6) AS DOUBLE) + 0.0
               AS sample_weight
    FROM g
    """,
)
def softdedup_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc SoftDeDup weight 1/group_size over bag-of-words
    duplicate groups — duplicates are down-weighted, not dropped, so
    rare phrasing inside a duplicate cluster still contributes.

    Scale: one corpus scan + ONE window exchange keyed on the
    fingerprint (count + min share the same partitioning, so Catalyst
    plans a single exchange); emits every doc (rule 11) with its group
    size, owner, and weight.
    """
    from iniz_exporters_spark.functions.text import poly_hash, tokens

    bow = F.array_join(
        F.array_sort(F.array_distinct(tokens("text"))), " "
    )
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", poly_hash(bow).alias("fp")
    )
    wfp = Window.partitionBy("fp")
    return d.select(
        "doc_id",
        F.count(F.lit(1)).over(wfp).cast("long").alias("group_size"),
        F.min("doc_id").over(wfp).alias("group_owner"),
        F.when(
            F.col("doc_id") == F.min("doc_id").over(wfp), 1
        ).otherwise(0).alias("is_owner"),
        (
            F.round(
                F.lit(1.0) / F.count(F.lit(1)).over(wfp), 6
            )
            + F.lit(0.0)
        ).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# ROUGE-N overlap (Lin 2004) between paired documents — the n-gram
# recall/precision/F1 used to score summaries and near-dup candidates
# alike. Pairs are (doc, next doc within the same source, by doc_id
# order) so every source contributes real comparisons at every scale.
# Overlap is the MULTISET intersection (sum over grams of
# min(count_a, count_b)) computed relationally: per-doc bigram counts,
# one equi-join on the gram, SUM(LEAST(...)) — never an array
# cross-product. Integer counts; the three ratios divide once at the
# sink (rule 8 NULLIF guards docs shorter than the gram width).
# ---------------------------------------------------------------------------


@register(
    "rouge_n_eval_q",
    """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    pairs AS (
        SELECT doc_id AS id_a,
               LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
                   AS id_b
        FROM toks
    ),
    grams AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks WHERE len(t) >= 2
        ) GROUP BY doc_id, g
    ),
    gtot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM grams
             GROUP BY doc_id),
    ov AS (
        SELECT p.id_a, p.id_b,
               CAST(SUM(LEAST(ga.c, gb.c)) AS BIGINT) AS overlap
        FROM pairs p
        JOIN grams ga ON ga.doc_id = p.id_a
        JOIN grams gb ON gb.doc_id = p.id_b AND gb.g = ga.g
        GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           COALESCE(o.overlap, 0) AS n_overlap,
           COALESCE(ta.n, 0) AS n_grams_a,
           COALESCE(tb.n, 0) AS n_grams_b,
           CAST(ROUND(COALESCE(o.overlap, 0)::DOUBLE
                / NULLIF(COALESCE(tb.n, 0), 0), 6) AS DOUBLE) + 0.0
               AS rouge2_recall,
           CAST(ROUND(COALESCE(o.overlap, 0)::DOUBLE
                / NULLIF(COALESCE(ta.n, 0), 0), 6) AS DOUBLE) + 0.0
               AS rouge2_precision,
           CAST(ROUND(2.0 * COALESCE(o.overlap, 0)
                / NULLIF(COALESCE(ta.n, 0) + COALESCE(tb.n, 0), 0), 6)
               AS DOUBLE) + 0.0 AS rouge2_f1
    FROM pairs p
    LEFT JOIN gtot ta ON ta.doc_id = p.id_a
    LEFT JOIN gtot tb ON tb.doc_id = p.id_b
    LEFT JOIN ov o ON o.id_a = p.id_a AND o.id_b = p.id_b
    WHERE p.id_b IS NOT NULL
    """,
)
def rouge_n_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 recall/precision/F1 for each (doc, next-doc-in-source)
    pair: multiset bigram overlap scored relationally.

    Scale: per-doc gram counts shuffle once on the gram key for the
    overlap join (the inverted-index shape — candidate cost is
    proportional to shared grams, never |A| x |B|); pair formation is
    one LEAD window per source; totals are metadata-wide joins. Emits
    every pair including zero-overlap ones (rule 11).
    """
    from iniz_exporters_spark.functions.text import tokens

    toks = Catalog(spark, sf_dir).documents.select(
        "doc_id", "source", tokens("text").alias("t")
    ).transform(pin)  # pairs, grams, totals all read it
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    pairs = toks.select(
        F.col("doc_id").alias("id_a"),
        F.lead("doc_id").over(wsrc).alias("id_b"),
    ).filter(F.col("id_b").isNotNull())
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat(
            F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
        ),
    )
    grams = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(pin)
    )
    gtot = grams.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n")
    )
    ga = grams.select(
        F.col("doc_id").alias("id_a"), "g", F.col("c").alias("ca")
    )
    gb = grams.select(
        F.col("doc_id").alias("id_b"), "g", F.col("c").alias("cb")
    )
    ov = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("overlap"))
    )
    ta = gtot.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    tb = gtot.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    # LEFT joins (review fix): a pair where either doc has < 2 tokens
    # must still be emitted (rule 11) with 0 grams and NULL ratios —
    # inner joins silently dropped it and made the NULLIF guards
    # unreachable
    na = F.coalesce(F.col("na"), F.lit(0))
    nb = F.coalesce(F.col("nb"), F.lit(0))
    return (
        pairs.join(ta, "id_a", "left")
        .join(tb, "id_b", "left")
        .join(ov, ["id_a", "id_b"], "left")
        .select(
            "id_a", "id_b",
            F.coalesce(F.col("overlap"), F.lit(0)).alias("n_overlap"),
            na.alias("n_grams_a"),
            nb.alias("n_grams_b"),
            r6(
                F.coalesce(F.col("overlap"), F.lit(0)).cast("double")
                / F.nullif(nb, F.lit(0))
            ).alias("rouge2_recall"),
            r6(
                F.coalesce(F.col("overlap"), F.lit(0)).cast("double")
                / F.nullif(na, F.lit(0))
            ).alias("rouge2_precision"),
            r6(
                F.lit(2.0) * F.coalesce(F.col("overlap"), F.lit(0))
                / F.nullif(na + nb, F.lit(0))
            ).alias("rouge2_f1"),
        )
    )


# ---------------------------------------------------------------------------
# Truncation-loss curve — context-window planning: if every document is
# truncated to L tokens, what fraction of corpus tokens survives and how
# many documents are cut at all? One conditional aggregate over per-doc
# token counts evaluates every L simultaneously; the L grid is a fixed
# literal, so the whole curve costs one corpus scan.
# ---------------------------------------------------------------------------

_TRUNC_GRID = (16, 24, 32, 48, 64)


@register(
    "truncation_loss_q",
    f"""
    WITH n AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '')) AS ntok
        FROM documents
    ),
    curve AS (
        {" UNION ALL ".join(
            f'''SELECT {L} AS max_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ntok > {L} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_truncated,
               CAST(SUM(ntok) AS BIGINT) AS n_tokens,
               CAST(SUM(LEAST(ntok, {L})) AS BIGINT) AS n_kept
            FROM n'''
            for L in _TRUNC_GRID
        )}
    )
    SELECT CAST(max_len AS INT) AS max_len, n_docs, n_truncated,
           n_tokens, n_kept,
           CAST(ROUND(n_kept::DOUBLE / NULLIF(n_tokens, 0), 6)
               AS DOUBLE) + 0.0 AS kept_frac
    FROM curve
    """,
)
def truncation_loss_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-survival curve under per-document truncation at each L in
    the grid: documents cut, tokens kept, kept fraction.

    Scale: ONE map-side-combining aggregate over per-doc token counts
    evaluates the whole grid (the grid unrolls into conditional sums,
    not per-L rescans — Spark computes them in a single pass over one
    corpus scan via a literal-exploded grid column).
    """
    from iniz_exporters_spark.functions.text import tokens

    n = Catalog(spark, sf_dir).documents.select(
        F.size(tokens("text")).alias("ntok")
    )
    grid = n.select(
        "ntok",
        F.explode(
            F.array(*[F.lit(L) for L in _TRUNC_GRID])
        ).alias("max_len"),
    )
    return grid.groupBy("max_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("ntok") > F.col("max_len"), 1).otherwise(0)
        ).cast("long").alias("n_truncated"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.sum(F.least("ntok", "max_len")).cast("long").alias("n_kept"),
    ).select(
        F.col("max_len").cast("int").alias("max_len"),
        "n_docs", "n_truncated", "n_tokens", "n_kept",
        (
            F.round(
                F.col("n_kept").cast("double")
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                6,
            )
            + F.lit(0.0)
        ).alias("kept_frac"),
    )


# ---------------------------------------------------------------------------
# Span-corruption accounting (T5, Raffel et al. 2020 section 3.1.4): the
# pretraining objective masks ~15% of tokens in spans of mean length 3;
# this query reports, per document, exactly what the deterministic
# masking schedule would corrupt — span starts are content-keyed hash
# decisions (poly(doc_id:pos) % 20 == 0, ~5% of positions) with lengths
# 2..4 (mean 3), and overlapping spans merge via the classic running-max
# island windows (per-doc, integer arithmetic throughout). The sentinel
# count a T5 encoder would see is the MERGED span count.
# ---------------------------------------------------------------------------


@register(
    "span_corruption_q",
    f"""
    WITH toks AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '')) AS ntok
        FROM documents
    ),
    starts AS (
        SELECT doc_id, ntok, pos,
               2 + ({_SQL_POLY.format(
                   s="doc_id::VARCHAR || ':' || pos::VARCHAR")} % 3)
                   AS span_len
        FROM toks, UNNEST(range(0, ntok::INT)) AS u(pos)
        WHERE {_SQL_POLY.format(
            s="doc_id::VARCHAR || ':' || pos::VARCHAR")} % 20 = 0
    ),
    spans AS (
        SELECT doc_id, ntok, pos AS s,
               LEAST(pos + span_len, ntok) AS e
        FROM starts
    ),
    flagged AS (
        SELECT doc_id, ntok, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM spans
    ),
    islands AS (
        SELECT doc_id, ntok, s, e,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s)
                   AS island_id
        FROM flagged
    ),
    merged AS (
        SELECT doc_id, island_id,
               MIN(s) AS i_start, MAX(e) AS i_end
        FROM islands GROUP BY doc_id, island_id
    ),
    per AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(i_end - i_start) AS BIGINT) AS n_masked
        FROM merged GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.ntok AS BIGINT) AS n_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.n_masked, 0) AS n_masked,
           CAST(ROUND(COALESCE(p.n_masked, 0)::DOUBLE
                / NULLIF(t.ntok, 0), 6) AS DOUBLE) + 0.0 AS mask_rate
    FROM toks t LEFT JOIN per p ON t.doc_id = p.doc_id
    """,
)
def span_corruption_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc T5 span-corruption accounting: merged span (sentinel)
    count, masked-token count, and mask rate under the deterministic
    hash schedule (5% starts, lengths 2-4).

    Scale: the position explode emits (doc, pos) rows only for HASH-
    SELECTED starts (~5% of tokens) — the explode is filtered before
    any shuffle; island merging is two windows partitioned by doc
    (span_dedup's exchange-reuse shape); every decision is integer
    hash arithmetic. Emits every doc including uncorrupted ones
    (rule 11).
    """
    from iniz_exporters_spark.functions.text import poly_hash, tokens

    toks = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.size(tokens("text")).alias("ntok")
    ).transform(pin)  # start-explode + final left join
    pos_hash = poly_hash(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
        )
    )
    starts = (
        # rule 14 guard: sequence(0, -1) DESCENDS for zero-token docs —
        # they must contribute NO positions (DuckDB range(0,0) is empty);
        # the final left join restores them with zero counts
        toks.filter(F.col("ntok") > 0)
        .select(
            "doc_id", "ntok",
            F.explode(
                F.sequence(F.lit(0), F.col("ntok") - 1)
            ).alias("pos"),
        )
        .withColumn("h", pos_hash)
        .filter(F.col("h") % 20 == 0)
        .select(
            "doc_id", "ntok",
            F.col("pos").alias("s"),
            F.least(
                F.col("pos") + 2 + F.col("h") % 3, F.col("ntok")
            ).alias("e"),
        )
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = starts.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
        ).otherwise(0),
    )
    wrun = Window.partitionBy("doc_id").orderBy("s")
    islands = flagged.withColumn(
        "island_id", F.sum("new_island").over(wrun)
    )
    merged = islands.groupBy("doc_id", "island_id").agg(
        F.min("s").alias("i_start"),
        F.max("e").alias("i_end"),
    )
    per = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("long").alias(
            "n_masked"
        ),
    )
    return toks.join(per, "doc_id", "left").select(
        "doc_id",
        F.col("ntok").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.coalesce(F.col("n_masked"), F.lit(0)).alias("n_masked"),
        (
            F.round(
                F.coalesce(F.col("n_masked"), F.lit(0)).cast("double")
                / F.nullif(F.col("ntok"), F.lit(0)),
                6,
            )
            + F.lit(0.0)
        ).alias("mask_rate"),
    )


# ---------------------------------------------------------------------------
# Diagonal-Mahalanobis embedding outliers — the embedding-space QA gate:
# standardize every dimension by the corpus mean/variance (exact DECIMAL
# moments; squared terms at decimal(16,6) per rule 2) and flag vectors
# whose squared Mahalanobis distance exceeds 2d (a fixed, literal
# threshold — no chi-square inverse needed). The synthetic embeddings
# are iid per-dimension with NO natural outliers (measured md2 range
# 61..68 around d=64 at every scale), so ~1% of vectors are spiked
# deterministically (vec_id % 97 == 0 -> 3x scale, the PII-spike
# convention applied to vectors) — the detector must then recover
# exactly that set through the corrupted statistics it also inflates.
# Per-dimension terms quantize to DECIMAL before the per-vector sum so
# the reduction is order-invariant (rule 1).
# ---------------------------------------------------------------------------


@register(
    "mahalanobis_outliers_q",
    """
    WITH x AS (
        SELECT vec_id, label, d - 1 AS dim,
               embedding[d]::DOUBLE
               * CASE WHEN vec_id % 97 = 0 THEN 3.0 ELSE 1.0 END AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(d)
    ),
    stats AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v::DECIMAL(18,9)) AS DOUBLE) / COUNT(*) AS mu,
               (CAST(SUM((v::DECIMAL(16,6)) * (v::DECIMAL(16,6)))
                     AS DOUBLE)
                - CAST(SUM(v::DECIMAL(18,9)) AS DOUBLE)
                  * CAST(SUM(v::DECIMAL(18,9)) AS DOUBLE) / COUNT(*))
               / COUNT(*) AS var
        FROM x GROUP BY dim
    ),
    terms AS (
        SELECT x.vec_id, x.label,
               CAST(ROUND((x.v - s.mu) * (x.v - s.mu)
                    / NULLIF(s.var, 0), 9) AS DECIMAL(20,9)) AS t
        FROM x JOIN stats s ON x.dim = s.dim
    ),
    per AS (
        SELECT vec_id, label,
               CAST(SUM(t) AS DOUBLE) AS md2,
               CAST(COUNT(*) AS BIGINT) AS d
        FROM terms GROUP BY vec_id, label
    )
    SELECT vec_id, label,
           CAST(ROUND(md2, 6) AS DOUBLE) + 0.0 AS md2,
           CASE WHEN md2 > 2 * d THEN 1 ELSE 0 END AS is_outlier
    FROM per
    """,
)
def mahalanobis_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared Mahalanobis distance under a diagonal
    covariance model, with an is_outlier flag at the 2d threshold —
    the screen that catches corrupt/degenerate embeddings before they
    poison ANN training.

    Scale: per-dim moments are ONE map-side-combining aggregate over
    the exploded (vec, dim) stream (d rows of state — metadata); the
    per-vector reduction joins the broadcast d-row stats table and
    sums decimal-quantized terms (order-invariant, rule 1); the
    threshold is a literal multiple of d. Emits every vector
    (rule 11).
    """
    e = Catalog(spark, sf_dir).embeddings
    spike = F.when(F.col("vec_id") % 97 == 0, F.lit(3.0)).otherwise(
        F.lit(1.0)
    )
    x = e.select(
        "vec_id", "label",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double") * spike)
        ),
    ).withColumnRenamed("pos", "dim").withColumnRenamed("col", "v")
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(18,9)")).alias("sv"),
        F.sum(
            F.col("v").cast("decimal(16,6)")
            * F.col("v").cast("decimal(16,6)")
        ).alias("svv"),
    ).select(
        "dim",
        (F.col("sv").cast("double") / F.col("n")).alias("mu"),
        (
            (
                F.col("svv").cast("double")
                - F.col("sv").cast("double")
                * F.col("sv").cast("double")
                / F.col("n")
            )
            / F.col("n")
        ).alias("var"),
    )
    terms = x.join(F.broadcast(stats), "dim").select(
        "vec_id", "label",
        F.round(
            (F.col("v") - F.col("mu"))
            * (F.col("v") - F.col("mu"))
            / F.nullif(F.col("var"), F.lit(0.0)),
            9,
        ).cast("decimal(20,9)").alias("t"),
    )
    per = terms.groupBy("vec_id", "label").agg(
        F.sum("t").cast("double").alias("md2"),
        F.count(F.lit(1)).cast("long").alias("d"),
    )
    return per.select(
        "vec_id", "label",
        (F.round(F.col("md2"), 6) + F.lit(0.0)).alias("md2"),
        F.when(F.col("md2") > 2 * F.col("d"), 1).otherwise(0).alias(
            "is_outlier"
        ),
    )

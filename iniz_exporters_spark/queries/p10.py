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
from iniz_exporters_spark.queries.p01 import _SQL_POLY


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
    " || CASE WHEN doc_id % 2 = 0 THEN ' card 4' ||"
    "      lpad(((doc_id * 2654435761) % 1000000000000000)::VARCHAR,"
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
    d = Catalog(spark, sf_dir).documents
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
                    ((F.col("doc_id") * 2654435761) % 1000000000000000)
                    .cast("string"),
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
    d = Catalog(spark, sf_dir).documents
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
    rules = spark.createDataFrame(
        [(r,) for r in _BLOCK_RULES], ["rule"]
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
    fh = d.groupBy("fp", "host").agg(F.count(F.lit(1)).alias("n_fh"))
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
               / (n::DOUBLE * (n * (n + 1) * (2 * n + 1) / 6)
                  - (n * (n + 1) / 2)::DOUBLE
                    * (n * (n + 1) / 2)::DOUBLE) AS b,
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
    b = (n * F.col("sty") - st * F.col("sy")).cast("double") / (
        n.cast("double") * st2.cast("double")
        - st.cast("double") * st.cast("double")
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
    s = F.aggregate(
        F.sequence(F.lit(2), n.cast("int")),
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
        .localCheckpoint(eager=False)
    )
    ev = e.select(F.col("vec_id").alias("cid"), "v")
    cv = cand.join(F.broadcast(ev), "cid").select(
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
        .localCheckpoint(eager=False)
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
        sel = sel.unionByName(pick).localCheckpoint(eager=False)
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

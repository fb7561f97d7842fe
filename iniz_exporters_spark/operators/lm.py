"""N-gram language-model and repeated-span operators over a text corpus.

The training-data uses: a smoothed bigram LM scores fluency (docs whose
cross-entropy under the corpus's own bigram statistics is an outlier are
boilerplate or gibberish), and repeated-span detection finds exact n-token
spans shared across documents (the cheap, shuffle-native cousin of
suffix-array substring dedup — Lee et al.'s "Deduplicating Training Data
Makes Language Models Better" motivates removing such spans).

All token/bigram extraction is per-row Catalyst (split + higher-order
functions, zero Python); the statistics are plain groupBy aggregations
with map-side partial counts, so each stage shuffles token-count rows —
never documents. Scoring joins are vocabulary-keyed; at web scale the
unigram/vocab frames are ~millions of rows (broadcastable or
AQE-handled), while the bigram join rides Zipf skew that AQE's skew-join
splitting absorbs (session default, see session.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iniz_exporters_spark.functions.text import poly_hash, tokens
from iniz_exporters_spark.session import spread_for_kernel
from iniz_exporters_spark.pinning import pin


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; docs with fewer than
    2 tokens contribute nothing."""
    toks = df.select(
        id_col, tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("__t"), i).alias("w1"),
            F.element_at(F.col("__t"), i + 1).alias("w2"),
        ),
    )
    return toks.select(id_col, F.explode(pairs).alias("__p")).select(
        id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_bigrams, logprob) — per-doc sum of log2 P(w2|w1) under an
    add-1-smoothed bigram model fit on the corpus itself:
    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).

    c(w1) counts w1 as a bigram LEFT (token occurrences minus doc-final
    positions); V is the distinct-token count over all positions. Each
    log-probability is cast to decimal(28,12) before summation so the
    per-doc sum is order-independent and the oracle hash-matches.
    """
    pairs = doc_bigrams(df, id_col, text_col)
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").alias("V"))
    )
    logp = F.log2(
        (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("V"))
    )
    return (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp.cast("decimal(28,12)")).cast("decimal(28,12)"),
                round_to,
            )
            .cast("double")
            .alias("logprob"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(span_hash, n_occurrences, n_docs) — hashes of every ``span``-token
    window that appears in at least ``min_docs`` distinct documents.

    The hash is poly_hash of the space-joined window, computed per-row
    inside nested higher-order functions; only (id, hash) rows shuffle to
    the group stage. At corpus scale this is the candidate generator for
    span-level dedup: join the flagged hashes back to trim or drop spans.
    """
    # tokenize+shingle+hash is the CPU kernel here (Catalyst-side, but
    # still ~10 µs/row of fold work): a small single-file input plans as
    # ONE scan split and would serialize it — spread it across the cores;
    # production-scale inputs pass through untouched.
    toks = spread_for_kernel(df.select(id_col, text_col)).select(
        id_col, tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= span)
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("__t") - (span - 1)),
        lambda i: poly_hash(F.array_join(F.slice(F.col("__t"), i, span), " ")),
    )
    return (
        toks.select(id_col, F.explode(hashes).alias("span_hash"))
        .groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_dedup_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """APPLY span-level dedup (the step after ``duplicate_spans`` flags
    cross-document spans): per document, count the token positions covered
    by any flagged span — (id, n_tokens, n_covered, n_kept) where
    n_kept = tokens surviving removal of every flagged window.

    Fully relational (Lee et al.'s removal accounting without per-row
    Python): span hashes explode to (id, pos, hash) rows, flagged hashes
    come from one groupBy, and coverage is interval-union island detection
    over the flagged start positions — one window over the per-doc
    positions (unique per doc, so the order is total), an occurrence
    opening a new island iff its start lies past the running max end of
    earlier intervals, island lengths summed per doc. No position-range
    explode anywhere (plan-pinned by
    ``test_span_dedup_coverage_has_no_position_explode``). Only
    (id, pos, hash) rows ever shuffle — never text — and the flagged-hash
    frame is duplicate-count-sized.
    """
    # same kernel-spread rationale as duplicate_spans: a single-split scan
    # serializes the shingle+hash fold onto one core (measured: 2.3 s of
    # the query's 3.1 s sf0.1 wall before the spread)
    toks = (
        spread_for_kernel(df.select(id_col, text_col))
        .select(id_col, tokens(text_col).alias("__t"))
        # Pinned (r14-opt): TWO consumers — the spans pipeline below and
        # the final n_tokens join leg — and without the pin the second
        # consumer re-runs the scan + spread exchange + tokenize fold
        # over the whole corpus (isolated interleaved A/B at sf0.1:
        # med 2.13 → 1.97 s). Lazy: the eager spans checkpoint right
        # below materializes it inside its own first job.
        .transform(pin)
    )
    spans = (
        toks.filter(F.size("__t") >= span)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (span - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        poly_hash(
                            F.array_join(F.slice(F.col("__t"), i, span), " ")
                        ).alias("h"),
                    ),
                )
            ).alias("__s"),
        )
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.h").alias("h"))
        # pinned once: both the flagged-hash aggregation and the coverage
        # join read this frame — without the checkpoint the token explode
        # and hash fold run twice (the unigram_logprob vocab pattern)
        .transform(pin, eager=True)
    )
    if min_docs == 2:
        # "appears in >= 2 distinct docs" needs no distinct count:
        # min(id) != max(id) is equivalent and plans as a plain two-phase
        # hash aggregate (map-side combine, one exchange on h) instead of
        # the distinct-aggregate rewrite's extra (h, id) exchange.
        flagged = (
            spans.groupBy("h")
            .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
            .filter(F.col("__lo") != F.col("__hi"))
            .select("h")
        )
    else:
        flagged = (
            spans.groupBy("h")
            .agg(F.count_distinct(id_col).alias("__nd"))
            .filter(F.col("__nd") >= min_docs)
            .select("h")
        )
    # Coverage = |union of intervals [pos, pos+span-1]| per doc. All
    # intervals share one length and per-doc positions are unique, so in
    # pos order each occurrence's end strictly exceeds its predecessor's:
    # the running max end IS the previous row's end, and the fresh cells
    # an occurrence adds are min(span, pos - lag(pos)). That collapses the
    # old island detection (running-max window + per-island groupBy + per-
    # doc groupBy: three exchanges after the join) to ONE lag window and
    # ONE groupBy on the id the window already partitioned by — Catalyst
    # reuses the hashpartitioning(id) exchange, so the whole coverage leg
    # is a single shuffle. (The explode-every-position + distinct variant
    # before that shuffled span× more rows; see the r8 slope incident.)
    occ = spans.join(flagged, "h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    fresh = F.least(
        F.lit(span), F.col("pos") - F.lag("pos", 1).over(w)
    )
    covered = (
        occ.select(
            id_col, F.coalesce(fresh, F.lit(span)).alias("__fresh")
        )
        .groupBy(id_col)
        .agg(F.sum("__fresh").alias("__ncov"))
    )
    return (
        toks.select(id_col, F.size("__t").alias("n_tokens"))
        .join(covered, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("__ncov"), F.lit(0))
            .cast("long")
            .alias("n_covered"),
            (
                F.col("n_tokens") - F.coalesce(F.col("__ncov"), F.lit(0))
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


def _apply_merge(arr: F.Column, a: str, b: str) -> F.Column:
    """One exhaustive left-to-right pass of BPE merge rule (a, b) → a+b over
    a symbol array, as a Catalyst fold. A single pass IS exhaustive for one
    rule: merging consumes both symbols and the merged symbol a+b can never
    reform the pair (a, b) with a neighbor (symbols are non-empty, so
    a+b ≠ a). try_element_at keeps the empty-accumulator probe NULL-safe
    under ANSI mode."""
    merged = a + b
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply_symbols(word_col: F.Column, merges: list[tuple[str, str]]):
    """A word re-tokenized by a BPE merge table: split to characters, then
    apply each merge rule exhaustively IN RANK ORDER. Rank-order sequential
    application equals the priority-queue apply of a real tokenizer: a
    rule's output symbol can only appear in rules learned after it, so once
    rule r is exhausted no earlier rule can become applicable again.

    Serving shape for 100 TB: the merge table is a static artifact (what a
    tokenizer.json ships), the whole chain is one codegen'd expression per
    row — no Python, no shuffle; segment the DISTINCT vocabulary and
    broadcast-join back to the token stream so the fold runs per distinct
    word, not per occurrence (see the bpe_apply_q registry entry).
    """
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(word_col, i, 1),
    )
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return syms


def _merge_word_syms(syms: list[str], a: str, b: str) -> list[str]:
    """Driver-side replica of ``_apply_merge``'s left-to-right fold."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _bpe_learn_driver(
    rows: list[tuple[str, int]], k: int
) -> list[tuple[str, str]]:
    """In-memory BPE trainer over a collected (word, freq) vocabulary with
    incremental pair-count maintenance — identical merge sequence to the
    distributed loop (same counts, same (cnt desc, a asc, b asc) pick,
    same exhaustive left-to-right apply), at Python-loop cost proportional
    to initial vocab size + touched words, not k * vocab."""
    words = [list(w) for w, _ in rows]
    freqs = [f for _, f in rows]
    cnt: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, syms in enumerate(words):
        f = freqs[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            cnt[p] = cnt.get(p, 0) + f
            occ.setdefault(p, set()).add(idx)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        best = None
        for p, c in cnt.items():
            if c <= 0:
                continue
            key = (-c, p[0], p[1])
            if best is None or key < best[0]:
                best = (key, p)
        if best is None:
            break
        a, b = best[1]
        merges.append((a, b))
        # occ may hold stale indexes (word changed since); the subtract /
        # re-add pair arithmetic is a net no-op for those, so correctness
        # never depends on eager cleanup
        for idx in occ.pop((a, b), ()):
            syms, f = words[idx], freqs[idx]
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] -= f
            syms = _merge_word_syms(syms, a, b)
            words[idx] = syms
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                cnt[p] = cnt.get(p, 0) + f
                occ.setdefault(p, set()).add(idx)
        cnt.pop((a, b), None)
    return merges


def bpe_learn(
    df: DataFrame,
    text_col: str,
    k: int = 4,
    checkpoint_every: int = 1,
    driver_vocab_max: int | None = 200_000,
) -> list[tuple[str, str]]:
    """Train ``k`` BPE merges on the corpus: each round counts adjacent
    symbol pairs across the (distinct-word, occurrence-weighted) vocabulary
    and takes the most frequent (count desc, pair asc tiebreak — the
    deterministic convention), then applies it before the next round.

    Driver loop with ONE single-row collect per round (metadata-scale);
    the pair counting is a groupBy over exploded (symbol, next) rows from
    the distinct vocabulary weighted by word frequency — vocabulary-sized,
    not corpus-sized, work per round. BPE is inherently sequential (merge
    r changes the pair counts merge r+1 sees), so rounds cannot fuse; what
    CAN be tuned at tokenizer scale (k in the hundreds) is the checkpoint
    cadence: ``checkpoint_every=c`` materializes the re-segmented
    vocabulary every c-th round and lets the in-between rounds stack their
    merge folds as lineage on the last snapshot — c-1 rounds of
    plan-only work traded against one materialization. The corpus-sized
    scan happens ONCE (building the weighted vocab); every training round
    after that touches vocabulary-sized data only, which is what keeps a
    100 TB corpus trainable: the loop cost is independent of corpus size.

    Hybrid execution: the weighted vocab is metadata next to the corpus,
    and when it has at most ``driver_vocab_max`` distinct words it is
    collected ONCE and the merge loop runs in-driver with incremental
    pair-count maintenance (``_bpe_learn_driver``) — the same sequential
    algorithm minus k * 2 Spark job roundtrips, which dominate wall time
    when k is tokenizer-scale. The distributed loop remains the fallback
    for vocabularies too large to collect (set ``driver_vocab_max=None``
    or 0 to force it); both paths produce the identical merge list
    (pinned by tests/test_round4_ops.py).
    """
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1: {checkpoint_every}")
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if driver_vocab_max:
        head = vocab.limit(driver_vocab_max + 1).collect()
        if len(head) <= driver_vocab_max:
            return _bpe_learn_driver(
                [(r["w"], r["freq"]) for r in head], k
            )
    syms_col = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    cur = vocab.select("w", "freq", syms_col.alias("syms")).transform(pin, eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(k):
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        )
        top = (
            cur.filter(F.size("syms") >= 2)
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = cur.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (r + 1) % checkpoint_every == 0:
            cur = cur.transform(pin, eager=True)
    return merges


def merge_pair_counts(
    df: DataFrame, text_col: str, top_n: int = 20
) -> DataFrame:
    """(pair, cnt, rn) — the ``top_n`` most frequent adjacent character
    pairs inside tokens: the statistic a BPE tokenizer trainer computes to
    pick its next merge. One explode + groupBy (map-side partials); the
    ordered limit plans as TakeOrderedAndProject."""
    toks = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.substring(F.col("w"), i, 2),
    )
    counted = (
        toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return counted.withColumn("rn", F.row_number().over(w))


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int = 8,
    granularity: int = 64,
) -> DataFrame:
    """Per-batch layout for length-bucketed training batches:
    (bucket, batch_id, n_docs, max_len, sum_len, padded_tokens, pad_waste).

    The standard padding-efficiency layout for variable-length training:
    docs are grouped into length buckets (lengths rounded UP to the
    ``granularity`` that the kernel pads to anyway), ordered longest-first
    within the bucket, and cut into fixed-size batches; each batch pads to
    its own max. ``pad_waste`` = padded_tokens - sum_len is the metric a
    pipeline tracks — naive random batching pays the corpus p99 length on
    every batch, this layout pays the per-bucket max.

    Scale shape: one shuffle, keyed on the bucket; the per-bucket window
    is the parallel unit (tens of buckets x millions of docs each — for a
    bucket too hot, raise ``granularity`` or sub-salt the bucket by a hash
    prefix, which only splits batches, never mixes lengths). The groupBy
    re-uses the same partitioning, so batch stats are map-side combined.
    """
    bucket = (
        F.ceil(F.col(len_col).cast("double") / F.lit(granularity))
        .cast("long")
        .alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col(len_col).desc(), F.col(id_col).asc()
    )
    laid = (
        df.select(F.col(id_col), F.col(len_col), bucket)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "batch_id", ((F.col("rn") - 1) / F.lit(batch_size)).cast("long")
        )
    )
    return (
        laid.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max(len_col).cast("long").alias("max_len"),
            F.sum(len_col).cast("long").alias("sum_len"),
        )
        .withColumn(
            "padded_tokens", (F.col("n_docs") * F.col("max_len")).cast("long")
        )
        .withColumn(
            "pad_waste", (F.col("padded_tokens") - F.col("sum_len")).cast("long")
        )
    )


def interpolated_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str = "lang",
    lam: float = 0.7,
    n_buckets: int = 3,
) -> DataFrame:
    """(id, lang, n_bigrams, ppl, bucket) — per-doc perplexity under a
    Jelinek-Mercer-interpolated bigram/unigram LM fit on the corpus
    itself, then a per-language head/middle/tail NTILE split.

    This is the CCNet recipe (Wenzek et al. 2020): score every document
    with an in-domain LM, split each language's distribution into
    perplexity terciles, and let downstream sampling prefer the "head".
    P(w2|w1) = lam * (c(w1,w2)+1)/(c(w1)+V) + (1-lam) * (c(w2)+1)/(N+V)
    — BOTH components add-1 smoothed: with a corpus-self-fit model an
    unsmoothed MLE bigram assigns probability 1.0 to every singleton
    bigram (c12 = c1 = 1), scoring gibberish as maximally fluent;
    ppl = 2^(-sum(log2 P)/n_bigrams), rounded to 2 dp before the NTILE
    ordering so the bucket assignment is cross-engine deterministic
    (ties broken by doc id).

    Scale: two token-count aggregations (map-side partials) + one
    vocab-keyed scoring join (Zipf skew absorbed by AQE); the NTILE is a
    per-language window over doc-level rows (one row per doc, not per
    token). No stage holds more than (vocab + docs) state.
    """
    # pairs feeds THREE consumers (c12, c1, the scoring join) and the
    # token stream two (cu, totals) — pin each once so the corpus is
    # tokenized once, not five times (same pattern as span_dedup_counts)
    pairs = doc_bigrams(df, id_col, text_col).transform(pin, eager=True)
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = df.select(F.explode(tokens(text_col)).alias("w")).transform(pin, eager=True)
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    totals = uni.agg(
        F.count(F.lit(1)).alias("N"), F.count_distinct("w").alias("V")
    )
    p_bi = (F.col("c12") + 1).cast("double") / (
        F.col("c1") + F.col("V")
    ).cast("double")
    p_uni = (F.col("cu") + 1).cast("double") / (F.col("N") + F.col("V")).cast(
        "double"
    )
    logp = F.log2(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
    scored = (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(cu.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp.cast("decimal(28,12)")).cast("decimal(28,12)"), 6
            )
            .cast("double")
            .alias("_logprob"),
        )
        .withColumn(
            "ppl",
            F.round(
                F.pow(
                    F.lit(2.0),
                    -F.col("_logprob") / F.col("n_bigrams").cast("double"),
                ),
                2,
            ),
        )
    )
    # distributed per-language NTILE (grouped_ntile): global
    # range-partitioned rank + broadcast group offsets — no per-language
    # window whose partitions scale with the corpus
    from iniz_exporters_spark.operators.indexing import grouped_ntile

    joined = scored.join(df.select(id_col, lang_col), id_col)
    return grouped_ntile(
        joined,
        [lang_col],
        [F.col("ppl").asc(), F.col(id_col).asc()],
        n_buckets,
        "bucket",
    ).select(id_col, lang_col, "n_bigrams", "ppl", "bucket")

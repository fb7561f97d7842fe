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

from iniz_exporters_spark.session import spread_for_kernel
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


# ---------------------------------------------------------------------------
# Text analysis (language-ID heuristic, quality scoring, fingerprinting)
# ---------------------------------------------------------------------------

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deliberately small and fixed so the DuckDB oracle can replay
#: the identical scoring.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "de", "et", "est", "les", "des", "une"),
}


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """How many tokens of the text are in ``words``."""
    return F.size(
        F.filter(
            tokens(col),
            lambda t: t.isin(*words),
        )
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {
        lang: stopword_hits(col, words) for lang, words in LANG_STOPWORDS.items()
    }


def predict_lang(col: Column | str) -> Column:
    """Argmax of stopword hits with fixed priority order en>es>de>fr on
    ties; 'und' (undetermined) when no list scores a hit."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # build the CASE chain in reverse priority so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        result = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(result)
    return result


def punct_ratio(col: Column | str) -> Column:
    """Share of characters that are not alphanumeric/space (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    stripped = F.regexp_replace(F.lower(c), "[a-z0-9 ]", "")
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / n
    )


def stopword_ratio(col: Column | str) -> Column:
    """Share of tokens that are English stopwords (0 for token-less text)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(col, LANG_STOPWORDS["en"]).cast("double") / n
    )


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards low punctuation noise,
    some stopword presence (fluent text), and reasonable length.

    Rounding happens in DECIMAL space (cast to decimal(28,12) first): the
    raw score is a sum of small rationals, and engines whose doubles differ
    by one ulp at an exact .xxxx5 boundary would otherwise round to
    different 4-dp values (observed at sf0.001/sf0.1). The decimal cast
    absorbs the ulp before the half-up round, and terminating score
    rationals terminate well before 12 digits, so both engines round the
    identical decimal."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c).cast("double") / 500, F.lit(1.0))
    raw = (
        0.4 * (1 - punct_ratio(c))
        + 0.3 * F.least(stopword_ratio(c) * 5, F.lit(1.0))
        + 0.3 * length_term
    )
    return F.round(raw.cast("decimal(28,12)"), 4).cast("double")


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: polynomial hash of the
    whitespace-normalized, lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return poly_hash(normalized)


def text_stats(df, id_col: str, text_col: str, carry_text: bool = False):
    """(id, quality_raw double, lang_pred string, n_tokens int) in ONE
    Arrow-batched pass — the vectorized fast path for the scoring HOFs
    above (``quality_score``/``predict_lang``/``whitespace_token_count``).

    ``quality_raw`` is the UNROUNDED composite; callers apply ``F.round``
    so the rounding semantics stay Spark's own (oracle-identical to the
    expression path — each arithmetic step is the same IEEE op in the same
    order, pinned by a parity test).

    ``carry_text=True`` additionally emits the input text column,
    UNTOUCHED, as a trailing column (r14-opt, guide §8's attach rule):
    callers that need text beside the scores previously re-attached it
    with a ``join(df, id_col)`` — locally AQE broadcasts the stats side,
    but at 100 TB the stats frame is corpus-cardinality and that join
    shuffles the full text payload by id. Passing text through the
    kernel costs one extra Arrow column on the return leg and removes
    the join (and its exchanges) entirely.
    """
    import re
    from typing import Iterator

    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, quality_raw double, lang_pred string, "
        "n_tokens int"
    )
    if carry_text:
        out_schema += f", {text_col} string"
    token_re = re.compile(TOKEN_RE)
    punct_re = re.compile("[a-z0-9 ]")
    ws_re = re.compile(r"\s+")
    stop = {lang: set(ws) for lang, ws in LANG_STOPWORDS.items()}
    prio = list(LANG_STOPWORDS)  # en > es > de > fr on ties

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, quals, langs, ntoks = [], [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                t = t or ""
                low = t.lower()
                n = len(t)
                toks = [x for x in token_re.split(low) if x]
                n_punct = n - len(punct_re.findall(low))
                punct = (n_punct / n) if n else 0.0
                hits = {
                    lang: sum(1 for x in toks if x in ws)
                    for lang, ws in stop.items()
                }
                sr = (hits["en"] / len(toks)) if toks else 0.0
                q = (
                    0.4 * (1 - punct)
                    + 0.3 * min(sr * 5, 1.0)
                    + 0.3 * min(n / 500, 1.0)
                )
                best = max(hits.values())
                lang = "und"
                if best > 0:
                    lang = next(l for l in prio if hits[l] == best)
                trimmed = t.strip()
                ids.append(i)
                quals.append(q)
                langs.append(lang)
                ntoks.append(len(ws_re.split(trimmed)) if trimmed else 0)
            out = {
                id_col: ids,
                "quality_raw": quals,
                "lang_pred": langs,
                "n_tokens": ntoks,
            }
            if carry_text:
                out[text_col] = pdf[text_col].values
            yield pd.DataFrame(out)

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def normalize_text(df, id_col: str, text_col: str):
    """(id, norm_text, n_chars_before int, n_chars_after int) — canonical
    text normalization: collapse whitespace runs to one space, trim,
    lowercase, then Unicode NFC composition.

    NFC matters for dedup/fingerprinting: 'cafe'+COMBINING ACUTE and the
    precomposed 'café' are byte-different but the same text; hashing
    without composing first splits what should be one dedup key. Spark has
    no NFC builtin, so this is an Arrow-batched ``mapInPandas`` kernel
    (per-row, zero shuffles — one scan at any corpus size); the DuckDB
    oracle replays it with ``nfc_normalize(lower(trim(regexp_replace(...))))``
    in the identical step order.
    """
    import re
    import unicodedata
    from typing import Iterator

    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, norm_text string, n_chars_before int, "
        "n_chars_after int"
    )
    ws_re = re.compile(r"\s+")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, norms, before, after = [], [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                t = t or ""
                norm = unicodedata.normalize(
                    "NFC", ws_re.sub(" ", t).strip().lower()
                )
                ids.append(i)
                norms.append(norm)
                before.append(len(t))
                after.append(len(norm))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "norm_text": norms,
                    "n_chars_before": before,
                    "n_chars_after": after,
                }
            )

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def char_entropy(df, id_col: str, text_col: str):
    """(id, n_chars int, char_entropy double) — Shannon entropy (base 2) of
    each row's character distribution.

    A cheap gibberish/repetition detector: natural English sits ~4 bits,
    'aaaa…' at 0, random base64 near 6 — filter tails on both ends before
    training. Vectorized numpy bincount per row inside ``mapInPandas``
    (per-row, zero shuffles). The value is left UNROUNDED; query sites
    round in decimal space so the DuckDB ``entropy()`` aggregate (same
    base-2 definition) hash-matches.

    Rows with empty text are emitted with entropy 0.0 and n_chars 0.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, n_chars int, char_entropy double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, ents = [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                t = t or ""
                n = len(t)
                if n == 0:
                    ent = 0.0
                else:
                    codes = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32
                    )
                    counts = np.unique(codes, return_counts=True)[1]
                    p = counts / n
                    ent = float(-(p * np.log2(p)).sum())
                ids.append(i)
                lens.append(n)
                ents.append(ent)
            yield pd.DataFrame(
                {id_col: ids, "n_chars": lens, "char_entropy": ents}
            )

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def chunk_tokens(df, id_col: str, text_col: str, size: int = 32, overlap: int = 8):
    """(id, chunk_idx, chunk, n_chunk_tokens) — overlapping token windows
    (RAG/embedding chunking): windows of ``size`` tokens every
    ``size - overlap`` tokens, last window truncated; token-less text yields
    one empty chunk.

    Pure Catalyst (sequence → transform → slice → posexplode): per-row
    compute, zero shuffles, codegen-friendly — chunking a 100 TB corpus
    costs one scan. Deterministic chunk_idx derives from the window start,
    so the DuckDB oracle replays it exactly.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, size))
    return df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "__ctoks")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int"),
        F.array_join("__ctoks", " ").alias("chunk"),
        F.size("__ctoks").cast("int").alias("n_chunk_tokens"),
    )


def feature_hash_vector(col: Column | str, dim: int = 64) -> Column:
    """Hashing-trick bag-of-words vector (Weinberger et al. 2009): each
    token is poly-hashed into one of `dim` buckets and the per-row dense
    count vector is built entirely with higher-order array functions —
    zero shuffles, zero Python, the whole featurization rides inside
    whole-stage codegen next to the scan.

    Collisions are the accepted trade-off of the hashing trick (no vocab
    pass, no dictionary state, bounded width at any corpus size); the
    deterministic poly hash keeps the DuckDB oracle replayable.
    """
    hashed = F.transform(tokens(col), lambda t: poly_hash(t) % dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(hashed, lambda h: h == b)),
    )

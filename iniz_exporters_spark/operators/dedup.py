"""Deduplication operators for the training-data pipeline (SURVEY §7 phase 5).

All four families:

  * exact          — hash-groupBy keep-first
  * MinHash + LSH  — shingle → k-permutation signatures → banded bucket join
  * SimHash        — bitwise majority vote over token hashes
  * n-gram Jaccard — exact similarity on LSH candidate pairs

Scale design: signatures are computed per-row (a doc's shingle set never
leaves its task) inside Arrow-batched ``mapInPandas`` kernels — numpy
vectorized rolling hashes, ~100× faster than the equivalent interpreted
Catalyst higher-order-function expressions, while producing **bit-identical
values** (the pure-Catalyst expression builders below remain the executable
spec and are cross-checked in tests). The only shuffles in the whole
pipeline are the band-bucket self-join and the candidate-pair verify join
(tiny rows: id + band + bucket). That is the textbook MinHash-LSH dataflow:
candidate generation cost is O(near-duplicate pairs), never O(n²).

Hashing is a polynomial fold (functions/text.py) rather than xx/murmur so
the DuckDB oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from iniz_exporters_spark.functions.text import MOD, char_shingles, poly_hash
from iniz_exporters_spark.session import spread_for_kernel
from iniz_exporters_spark.pinning import pin

#: MinHash permutation parameters h_j(x) = (A_j·x + B_j) mod MOD with
#: A_j = 1000003·j + 1 (nonzero mod the prime), B_j = 7919·j + 12345.
PERM_A_FACTOR = 1000003
PERM_B_FACTOR = 7919
PERM_B_OFFSET = 12345


# ---------------------------------------------------------------------------
# Pure-Catalyst expression builders (the executable spec; no Python).
# Used directly for small inputs and by the parity tests that pin the Arrow
# kernels to identical values.
# ---------------------------------------------------------------------------

def shingle_hash_set(text: Column | str, k: int = 5) -> Column:
    """Distinct polynomial hashes of the text's k-char shingles."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(char_shingles(c, k), lambda s: poly_hash(s))
    )


def minhash_value(hashes: Column, j: Column | int) -> Column:
    """min over the hash set of the j-th permutation."""
    jj = F.lit(j) if isinstance(j, int) else j
    a = jj * PERM_A_FACTOR + 1
    b = jj * PERM_B_FACTOR + PERM_B_OFFSET
    return F.array_min(F.transform(hashes, lambda h: (a * h + b) % MOD))


def minhash_signatures_expr(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 8, k: int = 5
) -> DataFrame:
    """(id, j, minhash) rows via pure Catalyst expressions (no Python)."""
    return (
        df.select(
            F.col(id_col), shingle_hash_set(text_col, k).alias("__hs")
        )
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("j"),
            F.col("__hs"),
        )
        .select(
            id_col,
            "j",
            minhash_value(F.col("__hs"), F.col("j")).alias("minhash"),
        )
    )


def simhash_signatures_expr(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) via pure Catalyst expressions — the executable spec.

    Written as a SQL expr because pyspark's shiftright/shiftleft wrappers
    only take literal shift amounts, while the SQL functions accept columns.
    """
    from iniz_exporters_spark.functions.text import tokens

    th = df.select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: poly_hash(t)).alias("__th"),
    )
    sim = f"""
      aggregate(
        transform(sequence(0, {bits - 1}), b ->
          CASE WHEN aggregate(
                 transform(__th, h ->
                   CASE WHEN shiftright(h, b) % 2 = 1 THEN 1L ELSE -1L END),
                 0L, (x, y) -> x + y) > 0
               THEN shiftleft(1L, b) ELSE 0L END),
        0L, (x, y) -> x + y)
    """
    return th.select(id_col, F.expr(sim).alias("simhash"))


# ---------------------------------------------------------------------------
# Arrow-vectorized kernels (numpy rolling hashes inside mapInPandas).
# Same math as the expression builders, batch-vectorized: shingle hash of
# s[i:i+k] is the k-step Horner fold h = h*31 + codepoint, computed for ALL
# shingles of a doc at once with k shifted vector ops.
# ---------------------------------------------------------------------------

def _np_shingle_hashes(text: str, k: int):
    """Distinct poly-hashes of all k-shingles — identical to
    ``shingle_hash_set`` (incl. short/empty-text edge cases)."""
    import numpy as np

    if not text:
        return np.zeros(1, dtype=np.int64)  # poly_hash("") == 0
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = len(cp) - k + 1
    if n < 1:  # whole (short) string is the single shingle
        h = 0
        for c in cp:
            h = (h * 31 + int(c)) % MOD
        return np.array([h], dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = (h * 31 + cp[j : j + n]) % MOD
    return np.unique(h)


def _np_token_hashes(text: str):
    """Poly-hash of each lowercase alphanumeric token — identical to
    ``transform(tokens(c), poly_hash)``."""
    import re

    import numpy as np

    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return np.zeros(0, dtype=np.int64)
    width = max(len(t) for t in toks)
    cp = np.zeros((len(toks), width), dtype=np.int64)
    mask = np.zeros((len(toks), width), dtype=bool)
    for i, t in enumerate(toks):
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        cp[i, : len(b)] = b
        mask[i, : len(b)] = True
    h = np.zeros(len(toks), dtype=np.int64)
    for j in range(width):
        m = mask[:, j]
        h[m] = (h[m] * 31 + cp[m, j]) % MOD
    return h


def _perm_mins(hs, num_perm: int):
    """MinHash vector of a distinct-hash set: min_j (A_j·h + B_j) mod MOD."""
    import numpy as np

    j = np.arange(num_perm, dtype=np.int64)
    a = j * PERM_A_FACTOR + 1
    b = j * PERM_B_FACTOR + PERM_B_OFFSET
    # (num_perm, |hs|): a_j ≤ 8e6, h < 1e9+7 → products < 2^63, int64-safe
    return ((a[:, None] * hs[None, :] + b[:, None]) % MOD).min(axis=1)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 8, k: int = 5
) -> DataFrame:
    """(id, j, minhash) rows — narrow per-row compute, zero shuffles.

    Arrow-batched numpy kernel; values bit-identical to
    ``minhash_signatures_expr`` (cross-checked in tests).
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, j int, minhash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, js, mins = [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                hs = _np_shingle_hashes(t or "", k)
                m = _perm_mins(hs, num_perm)
                ids.extend([i] * num_perm)
                js.extend(range(num_perm))
                mins.extend(m.tolist())
            yield pd.DataFrame(
                {id_col: ids, "j": np.array(js, dtype=np.int32), "minhash": mins}
            )

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def buckets_from_shingle_sets(
    hs_df: DataFrame,
    id_col: str,
    num_perm: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bucket) from an (id, hs) shingle-set DataFrame — lets the
    caller reuse one materialized hashing pass across LSH bucketing and
    exact verification."""
    import pandas as pd

    id_type = dict(hs_df.dtypes)[id_col]
    n_bands = num_perm // rows_per_band
    out_schema = f"{id_col} {id_type}, band int, bucket long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bands, buckets = [], [], []
            for i, hs in zip(pdf[id_col].values, pdf["hs"].values):
                m = _perm_mins(np.asarray(hs, dtype=np.int64), num_perm)
                for band in range(n_bands):
                    acc = 0
                    for v in m[band * rows_per_band : (band + 1) * rows_per_band]:
                        acc = (acc * 31 + int(v)) % MOD
                    ids.append(i)
                    bands.append(band)
                    buckets.append(acc)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "band": np.array(bands, dtype=np.int32),
                    "bucket": buckets,
                }
            )

    return spread_for_kernel(hs_df.select(id_col, "hs")).mapInPandas(
        kernel, out_schema
    )


def shingle_band_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 16,
    rows_per_band: int = 4,
    with_minhash: bool = False,
) -> DataFrame:
    """(id, hs array<long>, bands array<long>) in ONE Arrow pass — the
    fused form of ``shingle_sets`` + ``buckets_from_shingle_sets``.

    ``bands[i]`` is band *i*'s bucket (the polynomial fold of its
    signature rows), bit-identical to ``buckets_from_shingle_sets``;
    recover its (id, band, bucket) rows JVM-side with ``posexplode``.
    ``with_minhash=True`` appends the full MinHash vector as a trailing
    ``mins array<long>`` column (``mins[j]`` = signature row *j*,
    bit-identical to ``minhash_signatures`` — it is the same
    ``_perm_mins`` result the band fold consumes), for callers that
    would otherwise run the signature kernel as a third Arrow pass.

    Why fused (r15, guide §4): every mapInPandas stage pays a fixed
    Python-dispatch cost per task that dwarfs these kernels' compute
    (profiled ~0.35-0.55 s/task dispatch vs ~0.05 s/task hashing at
    sf0.1, and the same fixed cost exists per batch at cluster scale).
    LSH callers always need BOTH the shingle sets (verify side) and the
    band buckets (candidate side), so computing them in one pass halves
    the engine's Python-boundary crossings — and the band explode
    becomes a cheap codegen'd ``posexplode`` over the already-pinned
    frame instead of a second kernel needing its own pin.
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    n_bands = num_perm // rows_per_band
    out_schema = (
        f"{id_col} {id_type}, hs array<long>, bands array<long>"
    )
    if with_minhash:
        out_schema += ", mins array<long>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            sets, bands, mins = [], [], []
            for t in pdf[text_col].values:
                hs = _np_shingle_hashes(t or "", k)
                m = _perm_mins(hs, num_perm)
                row_bands = []
                for band in range(n_bands):
                    acc = 0
                    for v in m[band * rows_per_band : (band + 1) * rows_per_band]:
                        acc = (acc * 31 + int(v)) % MOD
                    row_bands.append(acc)
                sets.append(hs.tolist())
                bands.append(row_bands)
                if with_minhash:
                    mins.append(m.tolist())
            out = {id_col: pdf[id_col].values, "hs": sets, "bands": bands}
            if with_minhash:
                out["mins"] = mins
            yield pd.DataFrame(out)

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def band_rows(base: DataFrame, id_col: str) -> DataFrame:
    """(id, band, bucket) view over a ``shingle_band_sets`` frame."""
    return base.select(
        F.col(id_col), F.posexplode("bands").alias("band", "bucket")
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
) -> DataFrame:
    """(id, band, bucket) — one row per band; bucket is the polynomial fold
    of the band's signature values in j-order. Docs sharing any
    (band, bucket) are near-duplicate candidates. Zero shuffles."""
    return buckets_from_shingle_sets(
        shingle_sets(df, id_col, text_col, k), id_col, num_perm, rows_per_band
    )


def candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band-bucket."""
    a = buckets.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """(id, hs: array<long>) — each doc's distinct shingle-hash set, via the
    Arrow kernel (identical values to ``shingle_hash_set``)."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, hs array<long>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "hs": [
                        _np_shingle_hashes(t or "", k).tolist()
                        for t in pdf[text_col].values
                    ],
                }
            )

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
) -> DataFrame:
    """(id_a, id_b, jaccard) for LSH candidate pairs whose exact shingle-set
    Jaccard passes the threshold. Joins the (small) hash-set projection back
    onto the candidate pairs only — exact verification cost is proportional
    to candidates, not to n².

    Default b=4 bands × r=4 rows: the LSH S-curve midpoint (1/b)^(1/r) ≈ 0.71
    sits on the default 0.7 threshold — high recall at-threshold without the
    bucket-collision blowup loose bands (r=2) cause on template-heavy
    corpora (measured 2.16M → 19k candidate pairs on the sf0.1 documents
    table, identical surviving pairs).

    The shingle+band pass is ONE fused Arrow kernel (r15,
    ``shingle_band_sets``) computed once and ``localCheckpoint``ed
    (lazily): bucketing (a codegen'd posexplode of the band array — both
    self-join sides read the pinned frame, so no second pin is needed)
    and both verify-join sides reuse that single hashing pass instead of
    crossing the Python boundary twice."""
    base = shingle_band_sets(
        df, id_col, text_col, k, num_perm, rows_per_band
    ).transform(pin)
    pairs = candidate_pairs(band_rows(base, id_col), id_col)
    ha = base.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
    hb = base.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        pairs.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) — SimHash over the text's token-hash multiset: bit b of
    the signature is the sign of the sum of ±1 votes from each token hash's
    b-th bit. Arrow-batched kernel, zero shuffles; values bit-identical to
    ``simhash_signatures_expr``."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, simhash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shifts = np.arange(bits, dtype=np.int64)
        weights = np.int64(1) << shifts
        for pdf in batches:
            sigs = []
            for t in pdf[text_col].values:
                h = _np_token_hashes(t or "")
                if len(h) == 0:
                    sigs.append(0)
                    continue
                votes = (((h[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
                sigs.append(int(weights[votes > 0].sum()))
            yield pd.DataFrame({id_col: pdf[id_col].values, "simhash": sigs})

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def simhash_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a < id_b, hamming) — text near-duplicate pairs by banded
    Hamming distance over SimHash signatures (the classic web-scale dedup:
    Manku et al. 2007 shape). Candidates must share one of ``n_bands``
    equal-width signature bands — pigeonhole makes recall EXACT for
    Hamming ≤ n_bands−1 — and are verified with a codegen'd popcount.

    Scale shape: only (id, band_idx, band_value, signature) rows shuffle
    (signatures are one long each, never text); each band-value bucket
    joins within itself, so candidate volume is collision-bounded like
    MinHash-LSH band joins.
    """
    w = bits // n_bands
    mask = (1 << w) - 1
    # Pinned before the band self-join: both sides read the signatures,
    # and without the pin the Arrow SimHash kernel re-hashes the whole
    # corpus once per side (multi-consumer double-evaluation).
    sig = simhash_signatures(df, id_col, text_col, bits=bits).transform(pin)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.shiftright(F.col("simhash"), w * j)
                .bitwiseAND(F.lit(mask))
                .alias("v"),
            )
            for j in range(n_bands)
        ]
    )
    exploded = sig.select(
        F.col(id_col).alias("id"), "simhash", F.explode(bands).alias("b")
    ).select("id", "simhash", F.col("b.j").alias("j"), F.col("b.v").alias("v"))
    left = exploded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "j", "v"
    )
    right = exploded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "j", "v"
    )
    cand = (
        left.join(right, ["j", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("j", "v")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_exact(df: DataFrame, cols: list[str], order_col: str) -> DataFrame:
    """Exact dedup: keep the min-``order_col`` row per distinct ``cols``.

    At 100 TB: one shuffle on the (hashed) dedup key; the min-reduce is
    map-side partial so duplicate payloads never cross the network twice.
    """
    keep = (
        df.groupBy(*cols).agg(F.min(order_col).alias(order_col))
    )
    return df.join(keep, on=[*cols, order_col], how="left_semi")


# ---------------------------------------------------------------------------
# Word n-gram Jaccard with AllPairs prefix filtering (exact recall).
#
# Unlike the MinHash-LSH path above (probabilistic recall), prefix
# filtering (Chaudhuri/Bayardo AllPairs) guarantees EVERY pair with
# Jaccard >= t is produced: order each doc's distinct n-gram hashes by a
# global total order (ascending value); any qualifying pair must share an
# element within the first |S| - ceil(t·|S|) + 1 elements of both sets, so
# an equi-join on prefix elements is a complete candidate generator.
# ---------------------------------------------------------------------------

#: Horner factor folding token hashes into an n-gram hash
#: g = ((h1·P + h2) mod MOD · P + h3) mod MOD — matches the DuckDB oracle.
NGRAM_P = 1000003


def ngram_hash_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, gs: array<long>, sz: int) — sorted distinct word-n-gram hashes
    per doc. Docs with fewer than ``n`` tokens have no n-grams and are
    dropped (Jaccard over an empty set is undefined).

    Arrow kernel: token poly-hashes (same math as
    ``transform(tokens(c), poly_hash)``) folded n-at-a-time with vectorized
    shifted ops; ``np.unique`` both dedups and yields the ascending order
    the prefix filter needs. Per-row compute, zero shuffles."""
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, gs array<long>, sz int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, sets, sizes = [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                th = _np_token_hashes(t or "")
                m = len(th) - n + 1
                if m < 1:
                    continue
                acc = th[0:m].copy()
                for j in range(1, n):
                    acc = (acc * NGRAM_P + th[j : j + m]) % MOD
                gs = np.unique(acc)
                ids.append(i)
                sets.append(gs.tolist())
                sizes.append(len(gs))
            if ids:  # empty frame would lose the list<long> column dtype
                yield pd.DataFrame(
                    {id_col: ids, "gs": sets, "sz": np.array(sizes, dtype=np.int32)}
                )

    return spread_for_kernel(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """(id_a, id_b, jaccard) — every doc pair whose word-n-gram-set Jaccard
    is >= threshold. Exact (no probabilistic misses), via prefix filtering.

    ceil(t·|S|) is computed in integer arithmetic from the threshold's
    exact fraction so Spark and the oracle derive identical prefix lengths
    (float ceil is representation-sensitive: ceil(0.6·5) is 3 in decimal
    math but 4 in binary-double math).

    Scale shape (AllPairs/PPJoin, Bayardo et al. 2007 / Xiao et al. 2008):
    prefix elements are chosen by GLOBAL DOCUMENT FREQUENCY ascending, so
    each doc's prefix holds its rarest n-grams — the bucket-collision count
    behind candidate generation is sum(df²) over PREFIX hashes, which
    frequency ordering minimizes (hash ordering samples frequent n-grams
    into prefixes at the prefix rate and goes quadratic in df; measured
    1000× candidate overdraw vs true pairs at sf0.1). A positional filter
    then drops any (pair, match) row whose best-case overlap
    min(posA,posB) + min(|A|-posA, |B|-posB) cannot reach the Jaccard
    bound — safe, because true overlap never exceeds it at ANY matching
    position. The prefix explode emits only (id, sz, hash, pos) — set
    payloads never ride the candidate shuffle; each side's gs array joins
    back once per surviving candidate. The df aggregation and the per-doc
    rank window are both LINEAR shuffles (the df table is
    vocabulary-sized — AQE broadcasts it when small); they buy a
    candidate set bounded by rare-token collisions, ~O(qualifying pairs).
    The n-gram pass is localCheckpoint-ed so candidate generation and both
    verify sides reuse one hashing pass."""
    from fractions import Fraction

    from pyspark.sql import Window

    frac = Fraction(threshold).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator

    gs = ngram_hash_sets(df, id_col, text_col, n).transform(pin)
    # prefix length |S| - ceil(t·|S|) + 1, ceil done in exact integer math
    pref_cnt = F.col("sz") - F.floor((num * F.col("sz") + den - 1) / den).cast(
        "int"
    ) + 1
    ex = gs.select(F.col(id_col), F.col("sz"), F.explode("gs").alias("ph"))
    # exact document frequency per n-gram (gs is distinct per doc). Any
    # consistent global total order keeps the prefix theorem valid; (df,
    # hash) ascending is the collision-minimizing one.
    freq = ex.groupBy("ph").agg(F.count(F.lit(1)).alias("__df"))
    rank_w = Window.partitionBy(id_col).orderBy("__df", "ph")
    # NOT checkpointed: the candidate self-join reads this frame twice, but
    # both reads pipeline off the checkpointed gs through broadcast joins —
    # measured 3.2s vs 4.3s at sf0.01 WITH a checkpoint here (the
    # materialization barrier costs more than the duplicated agg+window over
    # vocabulary-scale data). Re-measured r14-opt (isolated interleaved
    # A/B at sf0.1, 5 alternating noop runs): unpinned med 3.84 s vs
    # pinned 4.72 s (+23%) — the decision stands.
    pref = (
        ex.join(freq, "ph")
        .withColumn("pos", F.row_number().over(rank_w))
        .filter(F.col("pos") <= pref_cnt)
        .select(id_col, "sz", "ph", "pos")
    )
    # AllPairs size filter: jaccard >= t forces t·|A| <= |B| <= |A|/t, so
    # size-incompatible bucket collisions are dropped BEFORE the distinct
    # and the payload-carrying verify joins (integer math, same fraction).
    # Positional filter: overlap >= ceil(t/(1+t)·(|A|+|B|)) is necessary
    # for jaccard >= t; at a match on positions (pa, pb) of the SAME global
    # order, overlap <= min(pa,pb) + min(|A|-pa, |B|-pb), so a row failing
    # ubound·(num+den) >= num·(|A|+|B|) can be dropped without losing any
    # qualifying pair (every matching row of a qualifying pair passes).
    pa, pb = F.col("a.pos"), F.col("b.pos")
    sa, sb = F.col("a.sz"), F.col("b.sz")
    ubound = F.least(pa, pb) + F.least(sa - pa, sb - pb)
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "ph")
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (sb * den >= sa * num)
            & (sa * den >= sb * num)
            & (ubound * (num + den) >= num * (sa + sb))
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ga = gs.select(F.col(id_col).alias("id_a"), F.col("gs").alias("gs_a"))
    gb = gs.select(F.col(id_col).alias("id_b"), F.col("gs").alias("gs_b"))
    inter = F.size(F.array_intersect("gs_a", "gs_b"))
    union = F.size("gs_a") + F.size("gs_b") - inter
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jacc_raw", inter.cast("double") / union)
        .filter(F.col("jacc_raw") >= threshold)
        .select("id_a", "id_b", F.round("jacc_raw", 4).alias("jaccard"))
    )


def ngram_overlap_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_shared: int = 25,
    broadcast_test: bool = True,
) -> DataFrame:
    """Train/test contamination detection: (train_id, test_id, n_shared)
    pairs sharing at least ``min_shared`` DISTINCT k-char shingle hashes.

    The standard decontamination shape for training-data pipelines: shingle
    both sides (distinct hashes per doc, same Arrow kernel as the
    MinHash/Jaccard family), join on the hash, count matches per pair.

    Scale shape: with ``broadcast_test=True`` (the normal case — benchmark/
    test sets are tiny next to a 100 TB corpus) the exploded test shingles
    broadcast, so the train corpus is scanned once and NEVER shuffled on
    the shingle hash; the only shuffle is the matched-pair aggregation,
    whose volume is bounded by true near-matches plus stopword-shingle
    noise. For adversarially common shingles, pre-filter the test side
    (drop hashes that occur in a large share of a train sample) before
    calling — the join itself stays candidate-bound.
    """
    tr = shingle_sets(train, id_col, text_col, k).select(
        F.col(id_col).alias("train_id"), F.explode("hs").alias("__h")
    )
    te = shingle_sets(test, id_col, text_col, k).select(
        F.col(id_col).alias("test_id"), F.explode("hs").alias("__h")
    )
    if broadcast_test:
        te = F.broadcast(te)
    return (
        tr.join(te, "__h")
        .filter(F.col("train_id") != F.col("test_id"))
        .groupBy("train_id", "test_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def incremental_neardup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental dedup: (batch_id, corpus_id, jaccard) near-dup links from
    an incoming batch into an existing corpus — the continual-training shape
    where each crawl/snapshot increment is deduped AGAINST the corpus
    without re-running the corpus self-join.

    Same MinHash-LSH band geometry as ``neardup_pairs`` (so a pair flagged
    here is exactly a pair the full self-join would flag), but the join is
    asymmetric: the batch's (band, bucket) rows BROADCAST, so the 100 TB
    corpus side is scanned once and never shuffled — per-increment cost is
    O(corpus scan + candidates), not O((corpus+batch)^2 bucketing). With
    ``broadcast_batch=False`` both sides shuffle on (band, bucket) for the
    rare batch too large to broadcast.

    At steady state the corpus' shingle sets and buckets are write-once
    artifacts: persist ``shingle_sets(corpus)`` / its buckets under the
    corpus snapshot and only the batch side is recomputed per increment —
    this function recomputes both so its contract is self-contained.
    """
    base_old = shingle_band_sets(
        corpus, id_col, text_col, k, num_perm, rows_per_band
    ).transform(pin)
    base_new = shingle_band_sets(
        batch, id_col, text_col, k, num_perm, rows_per_band
    ).transform(pin)
    return incremental_neardup_sets(
        base_old, base_new, id_col, threshold, broadcast_batch
    )


def incremental_neardup_sets(
    base_old: DataFrame,
    base_new: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
    broadcast_batch: bool = True,
) -> DataFrame:
    """``incremental_neardup`` over PRE-HASHED ``shingle_band_sets``
    frames (id, hs, bands) — the entry point when corpus and batch derive
    from the same table (run the fused kernel ONCE, pin, and split by
    filter instead of crossing the Python boundary per side), or when the
    corpus' hash artifacts are persisted between increments."""
    hs_old, hs_new = base_old, base_new
    b_old = band_rows(base_old, id_col).select(
        F.col(id_col).alias("corpus_id"), "band", "bucket"
    )
    b_new = band_rows(base_new, id_col).select(
        F.col(id_col).alias("batch_id"), "band", "bucket"
    )
    if broadcast_batch:
        b_new = F.broadcast(b_new)
    cand = (
        b_old.join(b_new, ["band", "bucket"])
        .filter(F.col("batch_id") != F.col("corpus_id"))
        .select("batch_id", "corpus_id")
        .distinct()
    )
    ha = hs_new.select(F.col(id_col).alias("batch_id"), F.col("hs").alias("hs_a"))
    if broadcast_batch:
        ha = F.broadcast(ha)
    hb = hs_old.select(F.col(id_col).alias("corpus_id"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.join(ha, "batch_id")
        .join(hb, "corpus_id")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def containment_pairs(
    corpus: DataFrame,
    probe: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
    broadcast_probe: bool = True,
) -> DataFrame:
    """(probe_id, host_id, containment) — pairs where at least ``threshold``
    of the probe doc's distinct k-shingle set appears in the host doc:
    asymmetric CONTAINMENT |A∩B| / |A|, the quote/inclusion detector.

    Symmetric Jaccard misses near-supersets (a paragraph quoted inside a
    10x longer page scores J ≈ 0.1 but containment ≈ 1.0) — exactly the
    pairs that matter for benchmark-answer contamination and boilerplate
    inclusion. Thresholding is exact integer math on the threshold's
    fraction, so no float boundary decides a pair.

    Scale shape: same as ``ngram_overlap_pairs`` — the (small) probe
    side's exploded shingles broadcast, the host corpus is scanned once
    and never shuffled on the shingle hash; the intersection size comes
    straight out of the matched-pair count aggregation (map-side
    combined), no set payloads ever cross the wire.
    """
    return containment_pairs_sets(
        shingle_sets(corpus, id_col, text_col, k),
        shingle_sets(probe, id_col, text_col, k),
        id_col=id_col,
        threshold=threshold,
        broadcast_probe=broadcast_probe,
    )


def containment_pairs_sets(
    corpus_sets: DataFrame,
    probe_sets: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    broadcast_probe: bool = True,
) -> DataFrame:
    """``containment_pairs`` over PRE-SHINGLED (id, hs) frames — the entry
    point when probe and corpus derive from the same table: shingle the
    table once (localCheckpoint it) and split, instead of running the
    Arrow shingle kernel twice over overlapping scans."""
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator
    pr = probe_sets.select(
        F.col(id_col).alias("probe_id"),
        F.size("hs").alias("sz"),
        F.explode("hs").alias("__h"),
    )
    if broadcast_probe:
        pr = F.broadcast(pr)
    tr = corpus_sets.select(
        F.col(id_col).alias("host_id"), F.explode("hs").alias("__h")
    )
    j = (
        tr.join(pr, "__h")
        .filter(F.col("probe_id") != F.col("host_id"))
        .groupBy("probe_id", "host_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.min("sz").alias("sz"),
        )
    )
    return (
        j.filter(F.col("n_shared") * den >= num * F.col("sz"))
        .select(
            "probe_id",
            "host_id",
            F.round(
                F.col("n_shared").cast("double") / F.col("sz"), 4
            ).alias("containment"),
        )
    )

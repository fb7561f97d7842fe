"""Similarity search over embedding columns (SURVEY §7 phase 5).

  * ``cosine`` — pure array-expression cosine (zip_with dot product +
    sequential aggregate): JVM-side, deterministic summation order.
  * ``knn_bruteforce`` — exact top-k: broadcast the (small) query set against
    the corpus; cost O(|corpus|·|queries|) with NO shuffle of the corpus —
    the canonical exact baseline at any corpus size as long as the query set
    broadcasts.
  * ``sign_bucket`` / ``ann_bucketed`` — LSH-style approximate path: bucket
    vectors by the sign pattern of their leading dimensions (axis-aligned
    random-hyperplane LSH with fixed planes, so it is deterministic and
    oracle-checkable), then search within buckets only. The bucket join
    shuffles on the bucket id; each bucket's pairwise work is 1/2^bits of
    the naive cross product in expectation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.pinning import pin


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


DEFAULT_MAX_BROADCAST_QUERIES = 100_000


def _broadcast_guard(
    queries: DataFrame, max_queries: int | None, what: str
) -> DataFrame:
    """Loud guard on the broadcast side of brute-force scoring; returns
    the frame the caller must use downstream.

    The plan is scale-safe only WHILE the query set broadcasts; a
    million-row query set would OOM executors with an opaque broadcast
    error deep in the shuffle layer. Mirrors ``_bucket_guard``: fail
    before the job with the actionable fix.

    The guard's count() would otherwise run the query side's whole
    upstream plan a second time when it is a derived (shuffle-bearing)
    frame, so non-bare-scan inputs are localCheckpoint-ed first — the
    count materializes the (small by contract) checkpoint and the
    broadcast reuses it, one upstream execution total (ADVICE r5 #2).
    Bare scans skip the checkpoint: re-scanning a file is the cheap case.
    """
    if max_queries is None:
        return queries
    from iniz_exporters_spark.session import _is_bare_scan

    if not _is_bare_scan(queries):
        queries = queries.transform(pin)
    n = queries.limit(max_queries + 1).count()
    if n > max_queries:
        raise RuntimeError(
            f"{what}: query set holds more than {max_queries} rows; a "
            "broadcast side this large would OOM executors — use the "
            "bucketed ANN paths (ann_bucketed / ivf_topk) for large query "
            "sets, or raise max_queries explicitly if the executors are "
            "sized for the broadcast"
        )
    return queries


def scored_vs_fixed_queries(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_queries: int | None = DEFAULT_MAX_BROADCAST_QUERIES,
    what: str = "scored_vs_fixed_queries",
    corpus_out: str = "neighbor_id",
    query_out: str = "query_id",
) -> DataFrame:
    """(corpus_out, query_out, cos) — the ROUNDED cosine of every corpus
    row against every row of a FIXED (guarded, broadcast-sized) query
    set, scored as one numpy matmul per Arrow batch.

    This is the guide-§4.2 replacement for per-pair HOF folds
    (zip_with + aggregate): the expression path re-walks both arrays
    element-by-element PER PAIR — and recomputes each side's norm per
    pair — where one BLAS matmul per batch scores the whole
    batch × query-set block at once. Arithmetic is dot-then-divide +
    round, exactly ``_topk_in_block``'s oracle-parity convention. The
    query set is collected once (bounded by the same guard as the
    broadcast-join path) and shipped per executor as a SparkContext
    broadcast; the corpus streams through ``mapInPandas`` and never
    shuffles.
    """
    import numpy as np

    queries = _broadcast_guard(queries, max_queries, what)
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in qrows])
    if len(qrows):
        q_mat = np.stack(
            [np.asarray(r[1], dtype=np.float64) for r in qrows]
        )
        q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    else:
        q_mat = np.zeros((0, 0))
        q_norm = np.zeros(0)
    bc = corpus.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_norm)
    )
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = (
        f"{corpus_out} {id_type}, {query_out} {id_type}, cos double"
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        qi, qm, qn = bc.value
        nq = len(qi)
        for pdf in batches:
            n = len(pdf)
            if n == 0 or nq == 0:
                yield pd.DataFrame(
                    {
                        corpus_out: pdf[id_col].values[:0],
                        query_out: pdf[id_col].values[:0],
                        "cos": np.zeros(0),
                    }
                )
                continue
            ids = pdf[id_col].values
            v = np.stack(
                [
                    np.asarray(x, dtype=np.float64)
                    for x in pdf[vec_col].values
                ]
            )
            v_norm = np.sqrt((v * v).sum(axis=1))
            sims = np.round(
                (v @ qm.T) / np.outer(v_norm, qn), round_to
            )
            yield pd.DataFrame(
                {
                    corpus_out: np.repeat(ids, nq),
                    query_out: np.tile(qi, n),
                    "cos": sims.ravel(),
                }
            )

    from iniz_exporters_spark.session import spread_for_kernel

    return spread_for_kernel(corpus.select(id_col, vec_col)).mapInPandas(
        kernel, out_schema
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = 5,
    round_to: int = 4,
    max_queries: int | None = DEFAULT_MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rn).

    Ranking uses the ROUNDED cosine with neighbor id as tiebreak so results
    are stable across engines/architectures. Scoring runs through the
    vectorized ``scored_vs_fixed_queries`` kernel (one matmul per Arrow
    batch) — dot-then-divide + round, the family's documented convention
    (ADVICE r14: np.round is half-to-even and BLAS accumulation order
    differs from the HOF fold, so parity with the old expression is
    oracle-gated/empirical, not by construction) — ~an order of magnitude
    less per-task CPU; the corpus still never shuffles for scoring, only
    (query_id, neighbor_id, cos) rows reach the top-k window.
    """
    scored = scored_vs_fixed_queries(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
        max_queries=max_queries,
        what="knn_bruteforce",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def jl_project(
    vec: Column,
    dim: int,
    out_dims: int = 4,
    round_to: int = 4,
) -> list[Column]:
    """Deterministic sparse Johnson-Lindenstrauss projection: ``out_dims``
    columns, each the ±1-signed sum over the input vector, signs derived
    from poly_hash(d:j) parity — content-free, engine-replayable, no
    stored projection matrix.

    The scale path for embedding ops: project 100 TB of wide vectors down
    to a handful of dims in one codegen'd scan (distance-preserving in
    expectation per JL), then bucket/cluster the projections instead of
    the raw vectors. Left-fold summation keeps the double result identical
    across engines (DuckDB list_reduce replays the same order).
    """
    v = _as_double(vec)

    def proj(j: int) -> Column:
        def step(acc: Column, d: Column) -> Column:
            sign = F.when(
                poly_hash(F.concat_ws(":", d.cast("string"), F.lit(str(j))))
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            return acc + F.element_at(v, d) * sign

        raw = F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)), F.lit(0.0), step
        )
        return (
            F.round(raw.cast("decimal(28,10)"), round_to)
            .cast("double")
            .alias(f"p{j}")
        )

    return [proj(j) for j in range(out_dims)]


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lo: float = 0.2,
    hi: float = 0.8,
    top_k: int = 5,
    round_to: int = 4,
    max_queries: int | None = DEFAULT_MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    most-similar corpus rows whose cosine lies in [lo, hi) — close enough
    to be informative negatives, below the near-duplicate band that would
    make them false negatives.

    Same plan shape as ``knn_bruteforce`` (broadcast queries over a single
    corpus scan — the corpus never shuffles, valid at any corpus size while
    the query set broadcasts); the band filter prunes before the per-query
    ranking window. Ranking is on the ROUNDED cosine with id tiebreak, so
    results are engine-stable.
    """
    queries = _broadcast_guard(queries, max_queries, "hard_negatives")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to)
        )
        .filter((F.col("cos") >= lo) & (F.col("cos") < hi))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


# ---------------------------------------------------------------------------
# Bounded-memory per-bucket kernels
#
# A bucket/cell is processed by ONE applyInPandas task. The naive kernel
# materialized the full n×n similarity matrix (V @ V.T) — at 100× corpus
# growth with a fixed bucket count that matrix grows quadratically and OOMs
# the task (a 25k-vector bucket is already a 5 GB float64 matrix). Both
# kernels below therefore score a CHUNK of query rows at a time against all
# n columns: peak score memory is chunk_cells doubles (default 4M ≈ 32 MB)
# regardless of bucket size, and the chunk shrinks automatically as n grows.
# The n×d vector block itself is the applyInPandas input and is linear in n;
# max_rows is the loud guard for buckets so hot that even that is a risk —
# the fix at that point is more bits/centroids, and silence would hide it.
# ---------------------------------------------------------------------------

DEFAULT_CHUNK_CELLS = 4_000_000  # 32 MB of float64 similarity scores
DEFAULT_MAX_BUCKET_ROWS = 1_000_000


def _bucket_guard(n: int, max_rows: int | None, what: str) -> None:
    if max_rows is not None and n > max_rows:
        raise RuntimeError(
            f"{what}: bucket holds {n} vectors (> max_rows={max_rows}); "
            "the per-task vector block no longer fits comfortably in "
            "executor memory — increase bits/n_centroids so buckets shrink, "
            "or raise max_rows explicitly if the executors are sized for it"
        )


def _topk_in_block(ids, V, top_k: int, round_to: int, chunk_cells: int):
    """Exact per-row top-k over one bucket, scored in row chunks.

    Ranking is identical to the unchunked kernel (and the SQL window spec):
    order by (-rounded_cos, neighbor_id), self excluded, k = min(top_k, n-1).
    Cosines are computed dot-then-divide exactly like the original kernel so
    rounded values cannot drift from the oracle.
    """
    import numpy as np
    import pandas as pd

    n = len(ids)
    norms = np.sqrt((V * V).sum(axis=1))
    k = min(top_k, n - 1)
    chunk = max(1, chunk_cells // n)
    qs, ns, cs, rs = [], [], [], []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sims = np.round((V[s:e] @ V.T) / np.outer(norms[s:e], norms), round_to)
        local = np.arange(e - s)
        sims[local, np.arange(s, e)] = -np.inf  # mask self
        order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)
        top = order[:, :k]
        qs.append(ids[np.repeat(np.arange(s, e), k)])
        ns.append(ids[top.ravel()])
        cs.append(sims[np.repeat(local, k), top.ravel()])
        rs.append(np.tile(np.arange(1, k + 1, dtype=np.int32), e - s))
    return pd.DataFrame(
        {
            "query_id": np.concatenate(qs),
            "neighbor_id": np.concatenate(ns),
            "cos": np.concatenate(cs),
            "rn": np.concatenate(rs),
        }
    )


def _make_topk_kernel(
    id_col: str,
    vec_col: str,
    top_k: int,
    round_to: int,
    chunk_cells: int,
    max_rows: int | None,
    what: str,
):
    def kernel(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cos": [], "rn": []}
            ).astype({"cos": "float64", "rn": "int32"})
        _bucket_guard(n, max_rows, what)
        ids = pdf[id_col].values
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        return _topk_in_block(ids, V, top_k, round_to, chunk_cells)

    return kernel


def bucket_loo_sqdist_pairs(
    b: DataFrame,
    bucket_col: str,
    id_col: str,
    label_col: str,
    vec_col: str,
    max_rows: int | None = DEFAULT_MAX_BUCKET_ROWS,
    chunk_cells: int = DEFAULT_CHUNK_CELLS,
    what: str = "bucket_loo_sqdist_pairs",
) -> DataFrame:
    """(qid, true_label, cand_label, cid, d2) — every ORDERED pair of
    distinct rows sharing a bucket, with the UNROUNDED squared euclidean
    distance.

    The guide-§4.2 replacement for the bucket-equi-join + per-pair HOF
    fold (``zip_with`` + ``aggregate``): the expression path is
    interpreted per ELEMENT per PAIR (~bucket_size × dims evaluations
    per row), where one numpy pass per bucket scores every pair at once.
    Bitwise parity with the HOF fold is by CONSTRUCTION, not convention:
    the kernel accumulates (x_j − y_j)² SEQUENTIALLY over dimensions
    (vectorized across pairs, ordered across dims — the same single-
    rounded IEEE op sequence as ``aggregate``'s left fold), and emits
    the raw double so the caller applies the same ``F.round`` it always
    did. One shuffle (groupBy bucket); pair rows never carry vector
    payloads; per-task score memory is chunk-bounded like the rest of
    the kernel family, with the loud ``max_rows`` guard."""
    id_type = dict(b.dtypes)[id_col]
    lab_type = dict(b.dtypes)[label_col]
    out_schema = (
        f"qid {id_type}, true_label {lab_type}, "
        f"cand_label {lab_type}, cid {id_type}, d2 double"
    )

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "qid": [], "true_label": [], "cand_label": [],
                    "cid": [], "d2": [],
                }
            ).astype({"d2": "float64"})
        _bucket_guard(n, max_rows, what)
        ids = pdf[id_col].values
        labs = pdf[label_col].values
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        d = V.shape[1]
        chunk = max(1, chunk_cells // n)
        qs, ts, cs, ns, ds = [], [], [], [], []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            acc = np.zeros((e - s, n))
            for j in range(d):
                diff = V[s:e, j][:, None] - V[:, j][None, :]
                acc += diff * diff
            keep = np.ones((e - s, n), dtype=bool)
            keep[np.arange(e - s), np.arange(s, e)] = False  # mask self
            qi, ci = np.nonzero(keep)
            qs.append(ids[qi + s])
            ts.append(labs[qi + s])
            cs.append(labs[ci])
            ns.append(ids[ci])
            ds.append(acc[qi, ci])
        return pd.DataFrame(
            {
                "qid": np.concatenate(qs),
                "true_label": np.concatenate(ts),
                "cand_label": np.concatenate(cs),
                "cid": np.concatenate(ns),
                "d2": np.concatenate(ds),
            }
        )

    return b.groupBy(bucket_col).applyInPandas(kernel, out_schema)


def sign_bucket(vec: Column, bits: int = 4, offset: int = 0) -> Column:
    """Deterministic LSH bucket: bit d = sign of dimension ``offset + d``
    (fixed axis-aligned hyperplanes)."""
    v = _as_double(vec)
    return (
        F.aggregate(
            F.zip_with(
                F.slice(v, offset + 1, bits),
                F.sequence(F.lit(0), F.lit(bits - 1)),
                # 2^d via pow (exact in double for d < 53); pyspark's
                # shiftleft wrapper would demand a literal shift amount
                lambda x, d: F.when(x >= 0, F.pow(F.lit(2.0), d)).otherwise(
                    F.lit(0.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        .cast("long")
    )


def _auto_split(
    b: DataFrame,
    bucket_col: str,
    vec_col: str,
    max_rows: int | None,
    split_bits: int,
    offset: int,
) -> DataFrame:
    """Two-level re-bucketing shared by the similarity family: a cheap size
    pre-pass (one count agg, broadcast back) finds buckets over ``max_rows``
    and re-buckets ONLY those by ``split_bits`` further sign dimensions —
    hot buckets split ~2^split_bits-ways while cold buckets keep full
    recall. Candidates in split buckets are a subset of the unsplit
    candidates (sign-prefix refinement), so recall degrades only inside the
    buckets that would otherwise have blown task memory; rows identical in
    all split dimensions still hit the loud ``max_rows`` guard as the final
    backstop."""
    if split_bits <= 0 or max_rows is None:
        return b
    hot = (
        b.groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_rows)
        .select(bucket_col, F.lit(True).alias("__hot"))
    )
    sub = sign_bucket(F.col(vec_col), split_bits, offset=offset)
    return (
        b.join(F.broadcast(hot), bucket_col, "left")
        .withColumn(
            bucket_col,
            F.when(
                F.col("__hot"),
                F.col(bucket_col) * (2 ** split_bits) + sub,
            ).otherwise(F.col(bucket_col)),
        )
        .drop("__hot")
    )


def ann_bucketed(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    top_k: int = 3,
    round_to: int = 4,
    chunk_cells: int = DEFAULT_CHUNK_CELLS,
    max_rows: int | None = DEFAULT_MAX_BUCKET_ROWS,
    auto_split_bits: int = 0,
) -> DataFrame:
    """Approximate top-k within each vector's sign bucket:
    (query_id, neighbor_id, cos, rn). Recall trades off with ``bits``.

    Scale shape: ONE shuffle (groupBy bucket), then each bucket's pairwise
    top-k runs as a vectorized numpy kernel inside ``applyInPandas`` — the
    candidate pair rows (and their two embedding payloads each) never hit
    the shuffle, which is what made the naive self-join-then-score plan 5×
    slower. Score memory is bounded at ``chunk_cells`` doubles per task
    (row-chunked matmul, never the full n×n matrix), and a bucket larger
    than ``max_rows`` fails loudly instead of OOMing — grow ``bits`` so
    ~|corpus|/2^bits vectors land per bucket.

    ``auto_split_bits`` > 0 enables two-level re-bucketing: a cheap size
    pre-pass (one count agg, broadcast back) finds buckets over
    ``max_rows`` and re-buckets ONLY those by ``auto_split_bits`` further
    sign dimensions — hot buckets split ~2^auto_split_bits-ways while cold
    buckets keep full recall. Candidates in split buckets are a subset of
    the unsplit candidates (sign-prefix refinement), so recall degrades
    only inside the buckets that would otherwise have blown memory. Rows
    still identical in all split dimensions keep the loud guard as the
    final backstop."""
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, cos double, rn int"
    )
    kernel = _make_topk_kernel(
        id_col, vec_col, top_k, round_to, chunk_cells, max_rows, "ann_bucketed"
    )

    b = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), bits).alias("__bucket"),
    )
    b = _auto_split(b, "__bucket", vec_col, max_rows, auto_split_bits, bits)
    return b.groupBy("__bucket").applyInPandas(kernel, out_schema)


def cosine_neardup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    threshold: float = 0.95,
    round_to: int = 4,
    chunk_cells: int = DEFAULT_CHUNK_CELLS,
    max_rows: int | None = DEFAULT_MAX_BUCKET_ROWS,
    auto_split_bits: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos) with
    rounded cosine ≥ ``threshold``, candidates restricted to each vector's
    sign bucket (same deterministic LSH as ``ann_bucketed``).

    Same scale shape as ``ann_bucketed``: one shuffle on the bucket id,
    per-bucket pairwise scoring vectorized in-task, upper-triangle only —
    pair rows never carry embedding payloads through a shuffle. Scoring is
    row-chunked (peak ``chunk_cells`` doubles), with the same loud
    ``max_rows`` guard; ``auto_split_bits`` > 0 re-buckets hot buckets by
    further sign dims instead of failing (see ``_auto_split``)."""
    import pandas as pd

    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"id_a {id_type}, id_b {id_type}, cos double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"cos": "float64"}
            )
        _bucket_guard(n, max_rows, "cosine_neardup")
        # order by id so emitted pairs are (smaller, larger)
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].values
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.sqrt((V * V).sum(axis=1))
        chunk = max(1, chunk_cells // n)
        outs = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round(
                (V[s:e] @ V.T) / np.outer(norms[s:e], norms), round_to
            )
            # strict upper triangle in GLOBAL indices: j > i
            local_i, global_j = np.nonzero(sims >= threshold)
            keep = global_j > (local_i + s)
            li, gj = local_i[keep], global_j[keep]
            outs.append(
                pd.DataFrame(
                    {"id_a": ids[li + s], "id_b": ids[gj], "cos": sims[li, gj]}
                )
            )
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"cos": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    b = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), bits).alias("__bucket"),
    )
    b = _auto_split(b, "__bucket", vec_col, max_rows, auto_split_bits, bits)
    return b.groupBy("__bucket").applyInPandas(kernel, out_schema)


def ivf_flat_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    top_k: int = 3,
    round_to: int = 4,
    chunk_cells: int = DEFAULT_CHUNK_CELLS,
    max_rows: int | None = DEFAULT_MAX_BUCKET_ROWS,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flat approximate top-k: assign every vector to its nearest
    centroid's cell (cosine), probe each query's ``nprobe`` nearest cells,
    search members of probed cells only: (query_id, neighbor_id, cos, rn).

    Centroids here are the ``n_centroids`` lowest-id corpus vectors — a
    deterministic, oracle-checkable stand-in for k-means training (swap in
    real centroids without touching the dataflow; ``kmeans_lloyd`` in
    operators/clustering.py trains real ones). Scale shape: the centroid
    set broadcasts (tiny by construction); assignment is per-row compute;
    the shuffles are the groupBy(cell) (probe rows multiply shuffled
    volume by ~nprobe) and the cross-cell re-rank over per-cell top-k
    candidates (≤ nprobe·top_k rows per query). ``n_centroids`` is the
    inverse-list fan-out knob — at 100 TB you grow it so
    ~|corpus|/n_centroids rows land per cell/task — and ``nprobe`` trades
    extra scan work for recall near cell boundaries.
    """
    import pandas as pd

    if not 1 <= nprobe <= n_centroids:
        raise ValueError(f"nprobe ({nprobe}) must be in [1, {n_centroids}]")
    cents = sorted(
        corpus.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .collect(),
        key=lambda r: r[0],
    )

    id_type = dict(corpus.dtypes)[id_col]

    def assign(batches):
        import numpy as np

        C = np.stack([np.asarray(r[1], dtype=np.float64) for r in cents])
        Cn = C / np.sqrt((C * C).sum(axis=1, keepdims=True))
        n_cents = len(C)
        for pdf in batches:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Vn = V / np.sqrt((V * V).sum(axis=1, keepdims=True))
            # rounded so engines with different fp summation order make the
            # same assignment at near-ties; ties -> lowest centroid index
            # (lexsort matches the oracle's ORDER BY cos DESC, idx)
            sims = np.round(Vn @ Cn.T, round_to)
            order = np.lexsort(
                (np.broadcast_to(np.arange(n_cents), sims.shape), -sims),
                axis=1,
            )
            n = len(pdf)
            ids, vecs, cells, member = [], [], [], []
            for p in range(nprobe):
                ids.append(pdf[id_col].values)
                vecs.append(pdf[vec_col].values)
                cells.append(order[:, p].astype("int32"))
                # the nearest cell is where the vector LIVES (member + its
                # own probe); farther probed cells are searched only
                member.append(np.full(n, p == 0))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    vec_col: np.concatenate(vecs),
                    "cell": np.concatenate(cells),
                    "is_member": np.concatenate(member),
                }
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign,
        schema=(
            f"{id_col} {id_type}, {vec_col} array<float>, cell int, "
            "is_member boolean"
        ),
    )

    cand_schema = f"query_id {id_type}, neighbor_id {id_type}, cos double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cos": []}
        ).astype({"cos": "float64"})
        members = pdf[pdf["is_member"].values]
        m = len(members)
        if m == 0:
            return empty
        _bucket_guard(len(pdf), max_rows, "ivf_flat_topk")
        m_ids = members[id_col].values
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in members[vec_col]]
        )
        m_norm = np.sqrt((M * M).sum(axis=1))
        q_ids = pdf[id_col].values
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        q_norm = np.sqrt((Q * Q).sum(axis=1))
        n = len(pdf)
        chunk = max(1, chunk_cells // m)
        qs, ns, cs = [], [], []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round(
                (Q[s:e] @ M.T) / np.outer(q_norm[s:e], m_norm), round_to
            )
            sims[q_ids[s:e, None] == m_ids[None, :]] = -np.inf  # self
            k = min(top_k, m)
            order = np.lexsort(
                (np.broadcast_to(m_ids, sims.shape), -sims), axis=1
            )
            top = order[:, :k]
            rows = np.repeat(np.arange(e - s), k)
            cols = top.ravel()
            vals = sims[rows, cols]
            keep = vals > -np.inf  # drop self-only or too-small cells
            qs.append(q_ids[rows[keep] + s])
            ns.append(m_ids[cols[keep]])
            cs.append(vals[keep])
        if not qs:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(qs),
                "neighbor_id": np.concatenate(ns),
                "cos": np.concatenate(cs),
            }
        )

    cand = assigned.groupBy("cell").applyInPandas(kernel, cand_schema)
    # cross-cell re-rank: ≤ nprobe·top_k candidates per query (a neighbor
    # is a member of exactly one cell, so no duplicate pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )

"""Distributed Lloyd's k-means over an embedding column.

The iterative-training genre of the pipeline operators: each round is
(1) ASSIGN — every vector to its nearest centroid, per-row compute with the
k×d centroid block broadcast into an Arrow-batched kernel (the corpus is
scanned, never shuffled), and (2) RECOMPUTE — per-dimension centroid means
via posexplode + one map-side-combined aggregation whose output is k×d rows
(metadata scale, collected to the driver like ivf_flat_topk's centroid
seed). Wall-clock per round at 100 TB = one corpus scan + one tiny agg;
rounds don't grow with data size.

Cross-engine determinism (the DuckDB oracle replays every round):
- init is the k lowest-id vectors (no RNG);
- assignment argmin uses the ROUNDED squared distance with lowest centroid
  index as tiebreak (same scheme as the ANN family's rounded-cosine ranking);
- recomputed means are rounded in DECIMAL space (cast decimal(28,12), round
  to 6) so engine-specific fp summation order cannot leak into the next
  round's distances.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from iniz_exporters_spark.session import metadata_df


def _assign(
    corpus: DataFrame,
    cents,
    id_col: str,
    vec_col: str,
    round_to: int,
) -> DataFrame:
    """(id, vec, cluster): nearest centroid by rounded squared euclidean
    distance, ties to the lowest centroid index."""
    import pandas as pd

    id_type = dict(corpus.dtypes)[id_col]
    vec_type = dict(corpus.dtypes)[vec_col]
    out_schema = f"{id_col} {id_type}, {vec_col} {vec_type}, cluster int"

    def kernel(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)  # k × d
        c_sq = (C * C).sum(axis=1)
        for pdf in batches:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = np.round(
                (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :],
                round_to,
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    vec_col: pdf[vec_col].values,
                    # argmin picks the FIRST minimum → lowest centroid index
                    "cluster": d2.argmin(axis=1).astype("int32"),
                }
            )

    # NOT spread_for_kernel: the vector kernel is numpy-matmul cheap and
    # callers (PQ, Lloyd) invoke it once per subspace x iteration — a
    # repartition per call would add m*iters shuffles for no kernel win
    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def lloyd_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    round_to: int = 6,
) -> list[list[float]]:
    """The centroids the FINAL assignment round uses: deterministic
    k-lowest-id init, then ``iters - 1`` assign→recompute rounds (the
    final ``_assign`` belongs to the caller). Raises if a cluster empties
    (the oracle cannot represent carry-forward centroids, and silence
    would hide a degenerate clustering). Each round costs one corpus scan
    plus a k×d metadata aggregate; the returned model is k×d floats."""
    init = (
        corpus.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    if len(init) < k:
        raise RuntimeError(f"lloyd_train: corpus has fewer than k={k} rows")
    cents = [list(map(float, r[1])) for r in init]
    dim = len(cents[0])

    for it in range(iters - 1):
        assigned = _assign(corpus, cents, id_col, vec_col, round_to)
        mean_rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.round(F.avg("val").cast("decimal(28,12)"), 6)
                .cast("double")
                .alias("m")
            )
            .collect()  # k × d rows — metadata scale by construction
        )
        by_cluster: dict[int, list[float]] = {}
        for r in mean_rows:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["m"]
        if len(by_cluster) < k:
            missing = sorted(set(range(k)) - set(by_cluster))
            raise RuntimeError(
                f"lloyd_train: cluster(s) {missing} emptied at iteration "
                f"{it}; re-seed with a different k or init"
            )
        cents = [by_cluster[j] for j in range(k)]
    return cents


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    round_to: int = 6,
    keep_vector: bool = False,
) -> DataFrame:
    """Final assignments (id, cluster) after ``iters`` Lloyd rounds.
    ``keep_vector=True`` keeps the vector column in the output
    (id, vec, cluster) so downstream per-cluster kernels (e.g. semantic
    dedup) avoid a corpus-sized re-join."""
    cents = lloyd_train(corpus, id_col, vec_col, k, iters, round_to)
    assigned = _assign(corpus, cents, id_col, vec_col, round_to)
    if keep_vector:
        return assigned
    return assigned.select(id_col, "cluster")


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    subdim: int = 16,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Product-quantization codes: split each vector into ``m`` contiguous
    ``subdim``-wide subvectors and run an independent deterministic Lloyd
    clustering (``kmeans_lloyd``) per subspace; a vector's code is its
    centroid index in each subspace. Output: (id, code_0 … code_{m-1}).

    PQ is the memory side of billion-scale ANN: m·log2(k) bits replace
    subdim·m floats per vector. Scale shape: each subspace clustering is
    the k-means plan (corpus scans + k×subdim metadata aggregates); the
    final code table assembles with id-keyed joins that co-partition on
    the id. Compression here is 64 floats -> 4 codes.
    """
    return pq_model(corpus, id_col, vec_col, m, subdim, k, iters)[0]


def _assign_pq(
    corpus: DataFrame,
    books,
    id_col: str,
    vec_col: str,
    round_to: int,
    keep_vector: bool,
) -> DataFrame:
    """(id[, vec], code_0 … code_{m-1}): per-subspace nearest-centroid
    codes for ALL m subspaces in one Arrow kernel pass — numerically
    identical to running ``_assign`` on each sliced subspace (same rounded
    squared distance, same first-minimum tiebreak), but one corpus scan
    instead of m."""
    import pandas as pd

    m = len(books)
    subdim = len(books[0][0])
    id_type = dict(corpus.dtypes)[id_col]
    vec_type = dict(corpus.dtypes)[vec_col]
    code_cols = [f"code_{j}" for j in range(m)]
    out_schema = f"{id_col} {id_type}, " + (
        f"{vec_col} {vec_type}, " if keep_vector else ""
    ) + ", ".join(f"{c} int" for c in code_cols)

    def kernel(batches):
        import numpy as np

        C = [np.asarray(b, dtype=np.float64) for b in books]  # m × (k, sub)
        c_sq = [(cj * cj).sum(axis=1) for cj in C]
        for pdf in batches:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = {id_col: pdf[id_col].values}
            if keep_vector:
                out[vec_col] = pdf[vec_col].values
            for j in range(m):
                S = V[:, j * subdim : (j + 1) * subdim]
                d2 = np.round(
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ C[j].T)
                    + c_sq[j][None, :],
                    round_to,
                )
                out[code_cols[j]] = d2.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def pq_model(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    subdim: int = 16,
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """(codes, codebooks): the code table of ``pq_encode`` plus the trained
    per-subspace centroid lists (m × k × subdim floats — the serving
    artifact an ADC search needs).

    All m subspace clusterings are FUSED: one init collect (the k
    lowest-id vectors, sliced per subspace), one ``_assign_pq`` kernel
    pass per round, and one posexplode aggregate producing all m×k×subdim
    means — versus the per-subspace loop's m inits + m scans + (m-1)
    id-joins. Values are bit-identical to the unfused form (same rounded
    distances, same decimal-rounded means), it is purely a plan-shape
    change; the final code table needs no join at all."""
    init = (
        corpus.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise RuntimeError(f"pq_model: corpus has fewer than k={k} rows")
    books = [
        [
            list(map(float, r[1][j * subdim : (j + 1) * subdim]))
            for r in init
        ]
        for j in range(m)
    ]

    for it in range(iters - 1):
        assigned = _assign_pq(
            corpus, books, id_col, vec_col, round_to=6, keep_vector=True
        )
        code_arr = F.array(*[F.col(f"code_{j}") for j in range(m)])
        ex = assigned.select(
            code_arr.alias("__codes"),
            F.posexplode(vec_col).alias("pos", "val"),
        )
        j_col = (F.col("pos") / subdim).cast("int")
        mean_rows = (
            ex.groupBy(
                j_col.alias("j"),
                F.element_at("__codes", j_col + 1).alias("cluster"),
                (F.col("pos") % subdim).alias("spos"),
            )
            .agg(
                F.round(F.avg("val").cast("decimal(28,12)"), 6)
                .cast("double")
                .alias("m")
            )
            .collect()  # m × k × subdim rows — metadata scale
        )
        by_jc: dict[tuple[int, int], list[float]] = {}
        for r in mean_rows:
            by_jc.setdefault((r["j"], r["cluster"]), [0.0] * subdim)[
                r["spos"]
            ] = r["m"]
        for j in range(m):
            missing = sorted(
                c for c in range(k) if (j, c) not in by_jc
            )
            if missing:
                raise RuntimeError(
                    f"pq_model: subspace {j} cluster(s) {missing} emptied "
                    f"at iteration {it}; re-seed with a different k or init"
                )
        books = [[by_jc[(j, c)] for c in range(k)] for j in range(m)]

    codes = _assign_pq(
        corpus, books, id_col, vec_col, round_to=6, keep_vector=False
    )
    return codes, books


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple],
    id_col: str = "vec_id",
    subdim: int = 16,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rn) — asymmetric-distance top-k
    over a PQ-coded corpus: the FAISS-IVFPQ scoring core.

    Each query builds an m × k lookup table of exact subvector→centroid
    squared distances (driver-side: m·k·subdim flops, metadata); a corpus
    vector's approximate distance is then m table lookups + m-1 adds over
    its CODES — the full-precision corpus is never touched at query time,
    which is the entire point of PQ at 100 TB: the scan reads m small ints
    per vector instead of d floats.

    Plan shape: the per-query LUT rows broadcast; scoring is codegen'd
    ``element_at`` lookups; the only shuffle is the per-query top-k
    window. Ranking is (rounded adc asc, id asc) so results replay
    cross-engine. At scale, compose with IVF: score ADC only inside the
    probed cells instead of ranking the whole corpus per query.

    ``queries``: list of (query_id, full_vector) pairs (metadata-scale,
    same contract as the kNN query broadcast).
    """
    from functools import reduce

    m = len(codebooks)
    lut_rows = []
    for qid, qv in queries:
        luts = []
        for j in range(m):
            sub = [float(x) for x in qv[j * subdim : (j + 1) * subdim]]
            lut = []
            for cent in codebooks[j]:
                # left-fold sum, same order the SQL replay uses
                lut.append(
                    reduce(
                        lambda a, b: a + b,
                        (
                            (sub[i] - cent[i]) * (sub[i] - cent[i])
                            for i in range(subdim)
                        ),
                    )
                )
            luts.append(lut)
        lut_rows.append((qid, *luts))
    spark = codes.sparkSession
    luts_df = metadata_df(spark,
        lut_rows,
        "query_id long, "
        + ", ".join(f"lut_{j} array<double>" for j in range(m)),
    )
    scored = codes.crossJoin(F.broadcast(luts_df)).filter(
        F.col(id_col) != F.col("query_id")
    )
    adc = reduce(
        lambda a, b: a + b,
        [
            F.element_at(F.col(f"lut_{j}"), F.col(f"code_{j}") + 1)
            for j in range(m)
        ],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("adc_dist", F.round(adc, round_to))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc_dist", "rn"
        )
    )


def grid_density(
    points: DataFrame,
    id_col: str,
    x,
    y,
    h: float = 0.1,
    min_pts: int = 8,
) -> DataFrame:
    """(id, cx, cy, nbr_count, is_core) — grid-bucketed density estimation,
    the scalable core-point step of DBSCAN (Ester et al. 1996; the grid
    formulation is the standard distributed adaptation): bucket every
    point into an h×h cell, count per cell, then sum each cell's 3×3
    neighborhood so a point's `nbr_count` bounds its eps-neighborhood
    (eps = h) from above. Points in neighborhoods under `min_pts` are
    density outliers (noise candidates); cores seed clusters.

    Scale: one point→cell count aggregation (key-only shuffle); the 3×3
    neighborhood sum runs on the CELL table (occupied-cell scale, ≪
    points) via a 9-way offset explode + re-agg; points get their
    neighborhood count back through a broadcastable cell-keyed join. No
    point-to-point distance is ever computed — the O(n²) neighborhood
    problem becomes O(cells·9).
    """
    pts = points.select(
        F.col(id_col).alias("id"),
        F.floor(x / F.lit(h)).cast("long").alias("cx"),
        F.floor(y / F.lit(h)).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("c"))
    offs = F.expr(
        "explode(flatten(transform(sequence(-1,1), "
        "dx -> transform(sequence(-1,1), dy -> struct(dx, dy)))))"
    )
    nbr = (
        cells.select("cx", "cy", "c", offs.alias("o"))
        .select(
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
            "c",
        )
        .groupBy("cx", "cy")
        .agg(F.sum("c").alias("nbr_count"))
    )
    return (
        pts.join(nbr, ["cx", "cy"])
        .select(
            F.col("id").alias(id_col),
            "cx",
            "cy",
            "nbr_count",
            (F.col("nbr_count") >= min_pts).alias("is_core"),
        )
    )

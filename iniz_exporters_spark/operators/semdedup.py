"""Semantic deduplication (SemDeDup): k-means the embedding space, then
drop within-cluster near-duplicates, keeping each duplicate group's
lowest-id representative.

The two-stage shape from Abbas et al. 2023 ("SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): clustering makes the
O(n²) pairwise cosine tractable by confining it to clusters, exactly like the
sign-bucket/IVF family in operators/similarity.py confines ANN search. At
100 TB the knob is ``k``: grow it so ~|corpus|/k vectors land per cluster
task; the per-cluster kernel is row-chunked (peak ``chunk_cells`` score
doubles, never an n×n matrix) with the same loud ``max_rows`` guard as the
ANN kernels. Shuffles: the k-means rounds are corpus scans + k×d metadata
aggregates (see operators/clustering.py); the dedup pass adds exactly ONE
shuffle (groupBy cluster) and pair rows never carry embedding payloads.

Cross-engine determinism: clustering follows kmeans_lloyd's replayable
scheme (k-lowest-id init, rounded-distance argmin, decimal-rounded means);
the keep decision compares the ROUNDED cosine (same convention as
cosine_neardup) against ``tau``, and "prior" rows are those with a smaller
id, so the kept set is engine- and partitioning-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iniz_exporters_spark.operators.clustering import kmeans_lloyd
from iniz_exporters_spark.operators.similarity import (
    DEFAULT_CHUNK_CELLS,
    DEFAULT_MAX_BUCKET_ROWS,
    _auto_split,
    _bucket_guard,
)


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    tau: float = 0.92,
    round_to: int = 4,
    chunk_cells: int = DEFAULT_CHUNK_CELLS,
    max_rows: int | None = DEFAULT_MAX_BUCKET_ROWS,
    auto_split_bits: int = 0,
) -> DataFrame:
    """(id, cluster, max_prior_cos, kept): for every vector, the max rounded
    cosine to any SMALLER-id vector in its k-means cluster (NULL if none),
    and kept = no such prior neighbor reaches ``tau``.

    Keeping the lowest id per duplicate group (rather than one arbitrary
    survivor) is what makes the output independent of partition layout and
    engine — the same convention as dedup_exact's min-order survivor.

    ``auto_split_bits`` > 0 sub-divides clusters over ``max_rows`` by that
    many sign dimensions (similarity._auto_split) instead of raising: prior
    neighbors are then sought within the sub-cluster only, so dedup recall
    degrades gracefully inside pathologically hot clusters while the
    reported ``cluster`` stays the original k-means id.
    """
    import pandas as pd

    assigned = kmeans_lloyd(
        corpus, id_col, vec_col, k=k, iters=iters, keep_vector=True
    )
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, cluster int, max_prior_cos double, kept boolean"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        _bucket_guard(len(pdf), max_rows, "semdedup")
        pdf = pdf.sort_values(id_col)
        n = len(pdf)
        ids = pdf[id_col].values
        cluster = pdf["cluster"].values
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.sqrt((V * V).sum(axis=1))
        mx = np.full(n, -np.inf)
        chunk = max(1, chunk_cells // n)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round(
                (V[s:e] @ V.T) / np.outer(norms[s:e], norms), round_to
            )
            # only PRIOR rows count: global column j < global row i
            mask = np.arange(n)[None, :] >= np.arange(s, e)[:, None]
            sims[mask] = -np.inf
            mx[s:e] = sims.max(axis=1)
        has_prior = np.isfinite(mx)
        # nullable Float64 so no-prior rows surface as SQL NULL (a raw NaN
        # would survive Arrow as NaN and hash-diverge from the oracle's NULL)
        mpc = pd.array(np.where(has_prior, mx, 0.0), dtype="Float64")
        mpc[~has_prior] = pd.NA
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": cluster.astype("int32"),
                "max_prior_cos": mpc,
                "kept": ~has_prior | (mx < tau),
            }
        )

    grouped = assigned.withColumn("__grp", F.col("cluster").cast("long"))
    grouped = _auto_split(
        grouped, "__grp", vec_col, max_rows, auto_split_bits, offset=0
    )
    return grouped.groupBy("__grp").applyInPandas(kernel, out_schema)

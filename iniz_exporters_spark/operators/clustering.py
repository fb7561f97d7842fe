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
from pyspark.sql import DataFrame


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

    return corpus.select(id_col, vec_col).mapInPandas(kernel, out_schema)


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    round_to: int = 6,
    keep_vector: bool = False,
) -> DataFrame:
    """Final assignments (id, cluster) after ``iters`` Lloyd rounds from the
    deterministic k-lowest-id init. Raises if a cluster empties (the oracle
    cannot represent carry-forward centroids, and silence would hide a
    degenerate clustering). ``keep_vector=True`` keeps the vector column in
    the output (id, vec, cluster) so downstream per-cluster kernels (e.g.
    semantic dedup) avoid a corpus-sized re-join."""
    init = (
        corpus.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    if len(init) < k:
        raise RuntimeError(f"kmeans_lloyd: corpus has fewer than k={k} rows")
    cents = [list(map(float, r[1])) for r in init]
    dim = len(cents[0])

    assigned = None
    for it in range(iters):
        assigned = _assign(corpus, cents, id_col, vec_col, round_to)
        if it == iters - 1:
            break
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
                f"kmeans_lloyd: cluster(s) {missing} emptied at iteration "
                f"{it}; re-seed with a different k or init"
            )
        cents = [by_cluster[j] for j in range(k)]
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
    out = None
    for j in range(m):
        sub = corpus.select(
            id_col, F.slice(F.col(vec_col), j * subdim + 1, subdim).alias(vec_col)
        )
        codes = kmeans_lloyd(
            sub, id_col, vec_col, k=k, iters=iters
        ).withColumnRenamed("cluster", f"code_{j}")
        out = codes if out is None else out.join(codes, id_col)
    return out

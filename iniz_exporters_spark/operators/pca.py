"""Exact distributed PCA over embedding columns (extension surface; the
reference has no embedding ops — lineage is the classic two-pass
covariance + driver-side eigendecomposition, e.g. Spark MLlib's
RowMatrix.computePrincipalComponents design, re-expressed as pure
DataFrame aggregation so Catalyst keeps the whole scan in codegen).

Scale shape (the part that matters at 100 TB):

  * The corpus is scanned ONCE. Each row emits its d(d+1)/2 upper-triangle
    products through a per-row array expression that is *pipelined into a
    map-side partial aggregate* — the explode never hits the shuffle.
    What crosses the wire is (num_partitions x d(d+1)/2) partial sums,
    i.e. metadata, independent of row count.
  * Sums are exact DECIMAL aggregations (order-independent), so the
    covariance matrix is bit-identical under any partitioning — the same
    determinism scheme the rest of the engine uses for double reductions.
  * Eigendecomposition runs driver-side on the d x d metadata matrix
    (numpy.linalg.eigh) — d is 64 here, 1-4k at the high end; never
    data-scale.
  * Projection is a codegen'd per-row dot product against the broadcast
    (literal) component vectors — zero shuffles, zero Python.

Why PCA next to ``jl_project`` (similarity.py): JL is data-oblivious — the
right tool when you cannot afford a second pass; PCA spends one metadata
aggregation to get the variance-optimal subspace, which is what you want
for IVF coarse quantizers and embedding drift monitoring.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def triangle_moments(
    df: DataFrame, vec_col: str, dims: int
) -> DataFrame:
    """(i, j, sp, n) for 0 <= i <= j < dims: exact decimal sums of the
    per-row products x_i * x_j, plus the row count.

    The per-row triangle is built as a flattened array-of-structs
    expression and exploded; Spark plans the explode -> partial-aggregate
    pipeline inside one stage, so the shuffle carries only the
    d(d+1)/2-row partials per task.
    """
    m = dims - 1
    tri = F.expr(
        f"flatten(transform(sequence(0, {m}), i -> transform(sequence(i, {m}),"
        f" j -> struct(i AS i, j AS j,"
        f" CAST({vec_col}[i] AS DOUBLE) * CAST({vec_col}[j] AS DOUBLE)"
        f" AS prod))))"
    )
    return (
        df.select(F.explode(tri).alias("t"))
        .select("t.i", "t.j", "t.prod")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("prod").cast("decimal(38,18)"))
            .cast("double")
            .alias("sp"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def dim_means(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """(dim, mu): exact-decimal per-dimension means of the first ``dims``
    coordinates. One posexplode -> map-side-combined groupBy."""
    return (
        df.select(F.posexplode(F.slice(vec_col, 1, dims)).alias("dim", "v"))
        .select("dim", F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
    )


def covariance_pairs(
    df: DataFrame, vec_col: str, dims: int, round_to: int = 6
) -> DataFrame:
    """(i, j, cov) population covariance for the upper triangle, rounded.

    cov(i,j) = E[x_i x_j] - mu_i mu_j, all terms from order-independent
    decimal sums, so the result hashes identically under any partition
    layout and replays exactly in ANSI SQL.
    """
    sp = triangle_moments(df, vec_col, dims)
    mu = dim_means(df, vec_col, dims)
    return (
        sp.join(
            F.broadcast(mu.select(F.col("dim").alias("i"), F.col("mu").alias("mu_i"))),
            "i",
        )
        .join(
            F.broadcast(mu.select(F.col("dim").alias("j"), F.col("mu").alias("mu_j"))),
            "j",
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.round(
                F.col("sp") / F.col("n") - F.col("mu_i") * F.col("mu_j"),
                round_to,
            ).alias("cov"),
        )
    )


@dataclass(frozen=True)
class PcaModel:
    dims: int
    mean: list[float]  # length dims
    eigvals: list[float]  # descending
    components: list[list[float]]  # top_k rows, each length dims
    trace: float  # sum of the (rounded) covariance diagonal


def _sign_fix(vec) -> list[float]:
    """Flip an eigenvector so its largest-magnitude entry is positive
    (lowest index wins ties) — removes the sign ambiguity so projections
    are deterministic across runs."""
    best = max(range(len(vec)), key=lambda i: (abs(vec[i]), -i))
    return [float(-x) for x in vec] if vec[best] < 0 else [float(x) for x in vec]


def pca_fit(
    df: DataFrame, vec_col: str, dims: int, top_k: int
) -> PcaModel:
    """Fit PCA on the first ``dims`` coordinates; driver work is a
    dims x dims eigh on collected metadata (d(d+1)/2 + d rows)."""
    import numpy as np

    cov_rows = covariance_pairs(df, vec_col, dims).collect()
    mu_rows = dim_means(df, vec_col, dims).collect()
    C = np.zeros((dims, dims))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    mean = [0.0] * dims
    for r in mu_rows:
        mean[r["dim"]] = float(r["mu"])
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:top_k]
    return PcaModel(
        dims=dims,
        mean=mean,
        eigvals=[float(vals[i]) for i in order],
        components=[_sign_fix(vecs[:, i]) for i in order],
        trace=float(np.trace(C)),
    )


def pca_project_cols(
    model: PcaModel, vec_col: str, round_to: int | None = None
) -> list[Column]:
    """One projection column per component: (x - mean) . w_k, inlined as a
    literal-coefficient sum so the whole projection stays in codegen."""

    def proj(k: int) -> Column:
        w = model.components[k]
        acc = F.lit(0.0)
        for i in range(model.dims):
            acc = acc + (
                F.element_at(vec_col, i + 1).cast("double")
                - F.lit(model.mean[i])
            ) * F.lit(w[i])
        if round_to is not None:
            acc = F.round(acc.cast("decimal(28,10)"), round_to).cast("double")
        return acc.alias(f"pc{k}")

    return [proj(k) for k in range(len(model.components))]


def projection_variances(
    df: DataFrame, vec_col: str, model: PcaModel
) -> list[float]:
    """Population variance of each projected component, via exact decimal
    sums (one scan, k aggregates). For a correct model these equal the
    eigenvalues — the sign-invariant contract a PCA check can pin."""
    cols = pca_project_cols(model, vec_col)
    aggs = []
    for k in range(len(model.components)):
        c = F.col(f"pc{k}")
        aggs.append(
            F.sum((c * c).cast("decimal(38,18)")).cast("double").alias(f"s2_{k}")
        )
        aggs.append(
            F.sum(c.cast("decimal(28,12)")).cast("double").alias(f"s1_{k}")
        )
    aggs.append(F.count(F.lit(1)).cast("long").alias("n"))
    row = df.select(*cols).agg(*aggs).collect()[0]
    n = row["n"]
    return [
        row[f"s2_{k}"] / n - (row[f"s1_{k}"] / n) ** 2
        for k in range(len(model.components))
    ]

"""Distributed LOPQ / PCA training — the 100 TB path for SURVEY §2.8 V1-V7.

``LOPQModel.fit`` (model.py) trains on a bounded driver sample, mirroring the
reference's ``nb_train`` subsample architecture. This module removes that
bound: every full-corpus pass — coarse k-means Lloyd iterations (V1), the
per-cluster residual moment accumulators that feed local rotations
(A3 / reference model.py:109-157), the global covariance for PCA
(A4 / model.py:242-287), and subquantizer k-means over projected residuals
(V5) — runs as Spark aggregations over Arrow batches:

  mapInPandas          per-partition partial moments (cluster, n, Σv, Σvvᵀ)
  groupBy+applyInPandas merge partials per cluster (map-side combine shape)
  driver               only V rows of (D/2)² floats: eigh + allocation (V2/V3)

Nothing vector-sized ever shuffles by row: partials are (V × moments) per
partition regardless of corpus size, which is the property that survives a
1000-executor 100 TB run. k-means++ init stays on a bounded driver sample
(init needs sequential dependence; the reference samples for init too), and
Lloyd refinement — the part that must see the full corpus — is distributed.

Parity: with the same seed, the distributed fit reproduces the driver-side
``LOPQModel.fit`` up to float-summation order (tests assert allclose + code
equality), so the whole encode/search stack is interchangeable between them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import LOPQModel, _kmeans_pp_init, eigenvalue_allocation

_STATS_SCHEMA = "cluster int, n bigint, s array<double>, op array<double>"


def _moment_partials(
    b_centers, lo: int, hi: int, with_outer: bool, center_of=None
):
    """mapInPandas fn: per partition, per nearest-centroid cluster of the
    [lo:hi) slice, emit (cluster, n, Σx, Σxxᵀ·flat). ``center_of`` subtracts
    the cluster centroid first (residual moments, A3)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_centers.value
        c_sq = (C**2).sum(axis=1)
        acc: dict[int, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)[:, lo:hi]
            d = (X**2).sum(1)[:, None] - 2 * X @ C.T + c_sq[None, :]
            assign = d.argmin(axis=1)
            for c in np.unique(assign):
                Xc = X[assign == c]
                if center_of is not None:
                    Xc = Xc - center_of.value[c]
                a = acc.setdefault(int(c), [0, 0.0, 0.0])
                a[0] += Xc.shape[0]
                a[1] = a[1] + Xc.sum(axis=0)
                if with_outer:
                    a[2] = a[2] + Xc.T @ Xc
        rows = {
            "cluster": list(acc),
            "n": [a[0] for a in acc.values()],
            "s": [a[1].tolist() for a in acc.values()],
            "op": [
                (a[2].ravel().tolist() if with_outer else []) for a in acc.values()
            ],
        }
        yield pd.DataFrame(rows)

    return fn


def _merge_stats(key, pdfs):
    n = int(pdfs["n"].sum())
    s = np.sum([np.asarray(x) for x in pdfs["s"]], axis=0)
    op = np.sum([np.asarray(x) for x in pdfs["op"]], axis=0)
    return pd.DataFrame(
        {"cluster": [key[0]], "n": [n], "s": [s.tolist()], "op": [op.tolist()]}
    )


def cluster_moments(
    vec_df: DataFrame,
    centers: np.ndarray,
    lo: int,
    hi: int,
    with_outer: bool = False,
    subtract_center: bool = False,
) -> dict[int, tuple[int, np.ndarray, np.ndarray | None]]:
    """Distributed per-cluster moments of the [lo:hi) vector slice assigned
    to nearest ``centers``: {cluster: (n, Σx, Σxxᵀ or None)}. The collect is
    V rows, independent of corpus size."""
    spark = vec_df.sparkSession
    b_c = spark.sparkContext.broadcast(centers)
    b_mu = spark.sparkContext.broadcast(centers) if subtract_center else None
    partials = vec_df.mapInPandas(
        _moment_partials(b_c, lo, hi, with_outer, center_of=b_mu),
        _STATS_SCHEMA,
    )
    merged = partials.groupBy("cluster").applyInPandas(_merge_stats, _STATS_SCHEMA)
    dim = hi - lo
    out: dict[int, tuple[int, np.ndarray, np.ndarray | None]] = {}
    for r in merged.collect():
        op = (
            np.asarray(r["op"], dtype=np.float64).reshape(dim, dim)
            if with_outer
            else None
        )
        out[int(r["cluster"])] = (int(r["n"]), np.asarray(r["s"]), op)
    return out


def lloyd_spark(
    vec_df: DataFrame,
    k: int,
    seed: int,
    lo: int,
    hi: int,
    n_iter: int = 25,
    init_sample: int = 20000,
) -> np.ndarray:
    """Distributed Lloyd k-means over the [lo:hi) slice of ``v``.

    k-means++ init on a bounded, deterministic driver sample (first
    ``init_sample`` rows by ``id`` — kmeans++ is index-sensitive, so the
    sample must be ordered for seed parity); every Lloyd pass is a
    full-corpus distributed moment aggregation. Reaches the same fixpoint as
    the driver ``model.kmeans`` (same init, same update rule, same
    deterministic farthest-point reseed for empty clusters)."""
    sample_df = vec_df.orderBy("id").limit(init_sample)
    S = np.array(
        [row["v"] for row in sample_df.collect()], dtype=np.float64
    )[:, lo:hi]
    if S.shape[0] < k:
        raise ValueError(f"need at least k={k} points, got {S.shape[0]}")
    rng = np.random.RandomState(seed)
    centers = _kmeans_pp_init(S, k, rng)
    for _ in range(n_iter):
        stats = cluster_moments(vec_df, centers, lo, hi, with_outer=False)
        new_centers = centers.copy()
        for c in range(k):
            if c in stats and stats[c][0] > 0:
                new_centers[c] = stats[c][1] / stats[c][0]
            else:
                # deterministic reseed: globally farthest point from its center
                new_centers[c] = _farthest_point(vec_df, centers, lo, hi)
        if np.allclose(new_centers, centers, rtol=0, atol=0):
            break
        centers = new_centers
    return centers


def _farthest_point(
    vec_df: DataFrame, centers: np.ndarray, lo: int, hi: int
) -> np.ndarray:
    spark = vec_df.sparkSession
    b_c = spark.sparkContext.broadcast(centers)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_c.value
        c_sq = (C**2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)[:, lo:hi]
            d = ((X**2).sum(1)[:, None] - 2 * X @ C.T + c_sq[None, :]).min(axis=1)
            i = int(d.argmax())
            yield pd.DataFrame({"d": [float(d[i])], "v": [X[i].tolist()]})

    top = (
        vec_df.mapInPandas(score, "d double, v array<double>")
        .orderBy(F.col("d").desc())
        .limit(1)
        .collect()
    )
    return np.asarray(top[0]["v"], dtype=np.float64)


def fit_spark(
    vec_df: DataFrame,
    V: int = 8,
    M: int = 8,
    K: int = 16,
    seed: int = 42,
    n_iter: int = 25,
    init_sample: int = 20000,
) -> LOPQModel:
    """Distributed LOPQ training over ``vec_df`` (column ``v array<double>``).

    Same parameter semantics as ``LOPQModel.fit`` (reference
    model.py:339-437) with every full-corpus pass distributed; see module
    docstring for the aggregation layout."""
    first = vec_df.limit(1).collect()
    D = len(first[0]["v"])
    if D % 2 or D % M or (D // 2) % (M // 2):
        raise ValueError(f"D={D} must split into 2 halves and M={M} subvectors")
    half, spl = D // 2, M // 2
    vec_df = vec_df.select("id", "v").persist()

    Cs = np.empty((2, V, half))
    Rs = np.empty((2, V, half, half))
    mus = np.empty((2, V, half))
    for h in range(2):
        lo, hi = h * half, (h + 1) * half
        C = lloyd_spark(
            vec_df, V, seed=seed + h, lo=lo, hi=hi,
            n_iter=n_iter, init_sample=init_sample,
        )
        Cs[h] = C
        # A3: distributed residual moments per coarse cluster
        stats = cluster_moments(
            vec_df, C, lo, hi, with_outer=True, subtract_center=True
        )
        for v in range(V):
            n, s, op = stats.get(v, (0, np.zeros(half), np.zeros((half, half))))
            if n < half:
                mus[h, v] = np.zeros(half)
                Rs[h, v] = np.eye(half)
            else:
                mu = s / n
                # centered covariance from raw residual moments:
                # Σ(r-μ)(r-μ)ᵀ = Σrrᵀ - n μμᵀ
                cov = (op - n * np.outer(mu, mu)) / max(n - 1, 1)
                eigvals, eigvecs = np.linalg.eigh(cov)
                perm = eigenvalue_allocation(eigvals, spl)
                mus[h, v] = mu
                Rs[h, v] = eigvecs[:, perm].T

    # V4 distributed: projected residuals for subquantizer training
    model_head = LOPQModel(
        V=V, M=M, K=K, D=D, Cs=Cs, Rs=Rs, mus=mus,
        subs=np.zeros((M, K, D // M)),
    )
    spark = vec_df.sparkSession
    b_head = spark.sparkContext.broadcast(model_head.to_arrays())

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = LOPQModel.from_arrays(b_head.value)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            P = m.project_residuals(X, m.coarse_assign(X))
            yield pd.DataFrame({"id": pdf["id"], "v": list(P)})

    proj_df = vec_df.mapInPandas(project, "id bigint, v array<double>").persist()
    sub_dim = D // M
    subs = np.empty((M, K, sub_dim))
    for m in range(M):
        h, s = m // spl, m % spl
        lo = h * half + s * sub_dim
        subs[m] = lloyd_spark(
            proj_df, K, seed=seed + 100 + m, lo=lo, hi=lo + sub_dim,
            n_iter=n_iter, init_sample=init_sample,
        )
    proj_df.unpersist()
    vec_df.unpersist()
    return LOPQModel(V=V, M=M, K=K, D=D, Cs=Cs, Rs=Rs, mus=mus, subs=subs)


# ---------------------------------------------------------------------------
# PCA (V7 / A4): distributed global covariance -> driver eigh -> project
# ---------------------------------------------------------------------------


def fit_pca_spark(
    vec_df: DataFrame, out_dim: int, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """(P, mu): top-``out_dim`` principal axes of ``v`` and the mean, from ONE
    distributed pass of (n, Σx, Σxxᵀ) (reference model.py:242-287 train_pca;
    eigenvector-order permutation by eigenvalue allocation is applied by the
    caller when feeding LOPQ, matching the reference pca+lopq composition)."""
    D = len(vec_df.limit(1).collect()[0]["v"])
    stats = cluster_moments(
        vec_df, np.zeros((1, D)), 0, D, with_outer=True
    )
    n, s, op = stats[0]
    mu = s / n
    cov = (op - n * np.outer(mu, mu)) / max(n - 1, 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    # descending eigenvalue order, deterministic sign (max-|coef| positive)
    order = np.argsort(-eigvals)[:out_dim]
    P = eigvecs[:, order]
    flip = np.sign(P[np.abs(P).argmax(axis=0), np.arange(P.shape[1])])
    flip[flip == 0] = 1.0
    return P * flip, mu


def pca_project(vec_df: DataFrame, P: np.ndarray, mu: np.ndarray) -> DataFrame:
    """Apply PCA + re-L2-normalize (reference apply_PCA + renorm idiom,
    model.py:878-978) as one Arrow pass; output column ``v``."""
    spark = vec_df.sparkSession
    b = spark.sparkContext.broadcast((P, mu))
    out_cols = [c for c in vec_df.columns if c != "v"]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in vec_df.schema if f.name != "v"]
        + ["v array<double>"]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P_, mu_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            Y = (X - mu_) @ P_
            norms = np.linalg.norm(Y, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            out = {c: pdf[c] for c in out_cols}
            out["v"] = list(Y / norms)
            yield pd.DataFrame(out)

    return vec_df.mapInPandas(fn, schema)

"""Numeric-oracle tests for the LOPQ pipeline (FIXTURES.md §B4/B5 contract).

The pure-numpy LOPQModel is the oracle; Spark-side encode/search must agree
with it, and retrieval quality must clear fixed floors vs brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq import queries as lq
from columbiaimagesearch_spark.lopq.encode import encode_dataframe
from columbiaimagesearch_spark.lopq.eval import brute_force_topk, recall_at_k
from columbiaimagesearch_spark.lopq.model import LOPQModel, eigenvalue_allocation, kmeans
from columbiaimagesearch_spark.lopq.search import multisequence_cells, search
from columbiaimagesearch_spark.sources import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


@pytest.fixture(scope="module")
def model(emb_np):
    _, X = emb_np
    return LOPQModel.fit(X, **lq.FIXTURE_PARAMS)


def test_kmeans_deterministic():
    rng = np.random.RandomState(0)
    X = rng.randn(300, 8)
    c1, a1 = kmeans(X, 7, seed=42)
    c2, a2 = kmeans(X, 7, seed=42)
    assert np.array_equal(c1, c2) and np.array_equal(a1, a2)
    # every cluster non-empty
    assert len(np.unique(a1)) == 7


def test_eigenvalue_allocation_balances():
    eigvals = np.array([100.0, 50.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    perm = eigenvalue_allocation(eigvals, 2)
    assert sorted(perm) == list(range(8))
    b1, b2 = np.log(eigvals[perm[:4]]).sum(), np.log(eigvals[perm[4:]]).sum()
    # balanced log-variance: buckets within a reasonable gap
    assert abs(b1 - b2) < np.log(eigvals).std() * 4


def test_rotations_are_orthonormal(model):
    for h in range(2):
        for v in range(model.V):
            R = model.Rs[h, v]
            assert np.allclose(R @ R.T, np.eye(model.half), atol=1e-8)


def test_encode_roundtrip_reduces_error(model, emb_np):
    _, X = emb_np
    coarse, fine = model.encode(X)
    X_hat = model.reconstruct(coarse, fine)
    err = np.linalg.norm(X - X_hat, axis=1)
    base = np.linalg.norm(X, axis=1)
    # quantization must recover most of the signal
    assert (err / base).mean() < 0.7
    # re-encoding the reconstruction is stable (eval.py:77-89 pattern)
    c2, f2 = model.encode(X_hat)
    agree = (c2 == coarse).all(axis=1).mean()
    assert agree > 0.95


def test_spark_encode_matches_numpy(spark, model, emb_np):
    ids, X = emb_np
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        int(r["id"]): (r["c1"], r["c2"], r["cell"], tuple(r["fine"]))
        for r in encode_dataframe(spark, emb, model).collect()
    }
    coarse, fine = model.encode(X)
    cells = model.cell_id(coarse)
    for i, vid in enumerate(ids):
        c1, c2, cell, f = got[int(vid)]
        assert (c1, c2) == (coarse[i, 0], coarse[i, 1])
        assert cell == cells[i]
        assert f == tuple(fine[i])


def test_adc_batch_dists_batch_shape_independent():
    """The shared ADC kernel must return BITWISE-identical distances for a
    row regardless of the batch it arrives in — the distributed path
    splits cells across Arrow batches while serving scores whole cells,
    and the serving ≡ batch ≡ twin identity rests on this. Singleton
    batches are the regression case: an (M, n).sum(axis=0) formulation
    collapses n=1 to a contiguous pairwise reduction and breaks it."""
    from columbiaimagesearch_spark.lopq.search import adc_batch_dists

    rng = np.random.RandomState(3)
    lut = rng.rand(8, 256)
    fine = rng.randint(0, 256, size=(1000, 8)).astype(np.int64)
    full = adc_batch_dists(lut, fine)
    for sl in [slice(0, 1), slice(5, 6), slice(999, 1000), slice(0, 7),
               slice(100, 613)]:
        assert np.array_equal(adc_batch_dists(lut, fine[sl]), full[sl]), sl


def test_multisequence_visits_in_distance_order(model, emb_np):
    _, X = emb_np
    d1, d2 = model.coarse_distances(X[0])
    counts = {c: 1 for c in range(model.V * model.V)}
    visited = multisequence_cells(d1, d2, counts, quota=model.V * model.V)
    assert sorted(visited) == list(range(model.V * model.V))  # full traversal
    dists = [d1[c // model.V] + d2[c % model.V] for c in visited]
    assert all(dists[i] <= dists[i + 1] + 1e-9 for i in range(len(dists) - 1))


def test_search_recall_floor(spark, model, emb_np):
    ids, X = emb_np
    emb = load_table(spark, SF_SMOKE, "embeddings")
    codes = encode_dataframe(spark, emb, model)
    queries = [(int(ids[i]), X[i]) for i in range(8)]
    truth = {
        int(ids[i]): t
        for i, t in enumerate(brute_force_topk(X[:8], X, ids, 10))
    }
    # ADC-only tier (no rerank): coarse but must beat the floor
    res = search(spark, codes, model, queries, quota=200, k=10)
    retrieved: dict[int, list[int]] = {}
    for r in res.orderBy("qid", "rank").collect():
        retrieved.setdefault(r["qid"], []).append(r["id"])
    rec_adc = recall_at_k(retrieved, truth, 10)
    # K=256 subquantizers (reference default) measure 0.562 here; the floor
    # leaves margin but would catch a regression to coarse quantization
    assert rec_adc >= 0.45, f"ADC recall@10 {rec_adc} below floor"
    # production tier: quota=300 + exact rerank of top-100 (reference
    # default path, searcher_lopqhbase.py:862-912)
    res = search(
        spark, codes, model, queries, quota=300, k=10,
        vectors=emb, rerank_nb=100,
    )
    retrieved = {}
    for r in res.orderBy("qid", "rank").collect():
        retrieved.setdefault(r["qid"], []).append(r["id"])
    rec_rr = recall_at_k(retrieved, truth, 10)
    # measured 0.8625 at K=256; the remaining misses are quota-bounded
    # (true neighbors in never-probed cells), not quantization error
    assert rec_rr >= 0.8, f"reranked recall@10 {rec_rr} below floor"
    assert rec_rr > rec_adc


def test_search_exact_parity_at_full_quota(spark, model, emb_np):
    """quota=ALL + rerank ALL candidates => top-k must equal brute force."""
    ids, X = emb_np
    emb = load_table(spark, SF_SMOKE, "embeddings")
    codes = encode_dataframe(spark, emb, model)
    queries = [(int(ids[i]), X[i]) for i in range(4)]
    n = len(ids)
    res = search(
        spark, codes, model, queries,
        quota=n, k=10, vectors=emb, rerank_nb=n,
    )
    retrieved: dict[int, list[int]] = {}
    for r in res.orderBy("qid", "rank").collect():
        retrieved.setdefault(r["qid"], []).append(r["id"])
    truth = {
        int(ids[i]): t for i, t in enumerate(brute_force_topk(X[:4], X, ids, 10))
    }
    assert retrieved == truth


def test_registry_lopq_queries_run(spark):
    from columbiaimagesearch_spark import registry

    specs = registry.all_specs()
    for name in (
        "lopq_encode_codes",
        "lopq_search_topk",
        "lopq_search_rerank",
    ):
        df = specs[name].builder(spark, SF_SMOKE)
        assert df.count() > 0, name


def test_cell_histogram_total(spark):
    from columbiaimagesearch_spark.lopq.queries import lopq_cell_histogram

    hist = lopq_cell_histogram(spark, SF_SMOKE)
    total = hist.agg(F.sum("n")).collect()[0][0]
    n_emb = load_table(spark, SF_SMOKE, "embeddings").count()
    assert total == n_emb


def test_pca_model_search_end_to_end(spark, emb_np):
    """LOPQModelPCA: one model object handed to search()/ServingSearcher with
    ORIGINAL-space queries (reference search.py:198-200 — the searcher
    projects when the model is PCA-composed). Full-quota + full-rerank must
    equal brute force in the projected space; serving must equal the
    distributed ADC tier query-for-query."""
    from columbiaimagesearch_spark.lopq.model import LOPQModelPCA
    from columbiaimagesearch_spark.lopq.serving import ServingSearcher
    from columbiaimagesearch_spark.lopq.train_spark import pca_project

    ids, X = emb_np
    n, out_dim = len(ids), X.shape[1] // 2
    # driver-side PCA fit (bounded-sample architecture, same math as
    # train_spark.fit_pca_spark: centered covariance -> eigh -> descending
    # order -> deterministic sign)
    mu = X.mean(axis=0)
    c = X - mu
    cov = c.T @ c / max(n - 1, 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(-eigvals)[:out_dim]
    P = eigvecs[:, order]
    flip = np.sign(P[np.abs(P).argmax(axis=0), np.arange(P.shape[1])])
    flip[flip == 0] = 1.0
    P = P * flip

    lopq = LOPQModel.fit(
        LOPQModelPCA(lopq=None, P=P, mu=mu).project_queries(X), V=4, M=8, K=16, seed=42
    )
    pca_model = LOPQModelPCA(lopq=lopq, P=P, mu=mu)

    vec_df = load_table(spark, SF_SMOKE, "embeddings").selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as v"
    )
    proj = pca_project(vec_df, P, mu).persist()
    codes = encode_dataframe(spark, proj, lopq, id_col="id", vec_col="v").persist()

    queries = [(int(ids[i]), X[i]) for i in range(4)]  # ORIGINAL space
    res = search(
        spark, codes, pca_model, queries,
        quota=n, k=10, vectors=proj, id_col="id", vec_col="v", rerank_nb=n,
    )
    retrieved: dict[int, list[int]] = {}
    for r in res.orderBy("qid", "rank").collect():
        retrieved.setdefault(r["qid"], []).append(r["id"])
    Yq = pca_model.project_queries(X[:4])
    Y = pca_model.project_queries(X)
    truth = {int(ids[i]): t for i, t in enumerate(brute_force_topk(Yq, Y, ids, 10))}
    assert retrieved == truth

    # serving tier: ADC-only answers equal the distributed ADC tier
    adc = search(spark, codes, pca_model, queries, quota=n, k=10)
    adc_ids: dict[int, list[int]] = {}
    for r in adc.orderBy("qid", "rank").collect():
        adc_ids.setdefault(r["qid"], []).append(r["id"])
    srv = ServingSearcher(pca_model).load_codes(codes)
    for qid, q in queries:
        assert [i for i, _ in srv.search(q, quota=n, k=10)] == adc_ids[qid]


def test_search_contracts_rerank_and_empty_schema(spark, model, emb_np):
    """Review r13 contracts: (a) 0 < rerank_nb < k refuses loudly instead
    of silently returning rerank_nb rows per query; (b) an empty probe
    with rerank requested returns the RERANK schema (exact_dist present),
    so unioning shard results never hits an empty-shard AnalysisException;
    (c) a failed _cell_counts refusal does not strand a codes cache
    entry."""
    import pytest

    ids, X = emb_np
    emb = load_table(spark, SF_SMOKE, "embeddings")
    codes = encode_dataframe(spark, emb, model)
    queries = [(int(ids[0]), X[0])]
    with pytest.raises(ValueError, match="rerank_nb"):
        search(spark, codes, model, queries, k=10, vectors=emb, rerank_nb=5)

    # empty probe (no codes at all) keeps the rerank schema
    empty_codes = codes.where(F.lit(False))
    res = search(
        spark, empty_codes, model, queries, k=10, vectors=emb, rerank_nb=20
    )
    assert res.columns == ["qid", "rank", "id", "adc_dist", "exact_dist"]
    assert res.count() == 0
    res2 = search(spark, empty_codes, model, queries, k=10)
    assert res2.columns == ["qid", "rank", "id", "adc_dist"]

"""Distributed eval-harness parity: each metric of lopq/eval.py must match
a direct numpy evaluation of the reference formulas (eval.py:50-161) on the
same fixture model + smoke embeddings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq import eval as lopq_eval
from columbiaimagesearch_spark.lopq.queries import codes_df, fixture_model
from columbiaimagesearch_spark.sources import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fixture(spark):
    model = fixture_model(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return model, emb, ids, X


def test_same_cell_neighbor_rate(spark, fixture):
    model, emb, ids, X = fixture
    # true 1-NN (excluding self) by brute force
    d = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d, np.inf)
    nn_idx = d.argmin(axis=1)
    nns = spark.createDataFrame(
        [(int(i), int(ids[j])) for i, j in zip(ids, nn_idx)], "id long, nn_id long"
    )
    got = lopq_eval.same_cell_neighbor_rate(codes_df(spark, SF_SMOKE), nns)
    cells = model.cell_id(model.coarse_assign(X))
    want = float((cells == cells[nn_idx]).mean())
    assert got == pytest.approx(want, abs=1e-12)
    assert 0.0 < got <= 1.0


def test_same_cell_rate_counts_uncovered_pairs_as_not_same(spark, fixture):
    """A pair whose either endpoint is missing from codes stays in the
    denominator as not-same-cell (codes may cover a subset of the corpus);
    the inner-join form silently dropped such pairs."""
    model, emb, ids, X = fixture
    codes = codes_df(spark, SF_SMOKE)
    nns = spark.createDataFrame(
        [(int(ids[0]), int(ids[1])), (int(ids[0]), -12345)], "id long, nn_id long"
    )
    n, same = lopq_eval.same_cell_neighbor_stats(codes, nns)
    assert n == 2  # the uncovered pair is still counted
    cells = model.cell_id(model.coarse_assign(X[:2]))
    assert same == int(cells[0] == cells[1])


def test_exact_nn_pairs_matches_brute_force(spark, fixture):
    """The distributed 1-NN pass (shared exact_nn_block kernel) must equal
    the full-matrix brute force, including (dist, id) tie-breaks."""
    model, emb, ids, X = fixture
    got = {
        r["id"]: r["nn_id"] for r in lopq_eval.exact_nn_pairs(emb).collect()
    }
    d = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d, np.inf)
    for row, i in enumerate(ids):
        want = int(ids[np.lexsort((ids, d[row]))[0]])
        assert got[int(i)] == want


def test_reconstruction_code_stability(spark, fixture):
    model, emb, ids, X = fixture
    got = lopq_eval.reconstruction_code_stability(emb, model)
    c1, f1 = model.encode(X)
    c2, f2 = model.encode(model.reconstruct(c1, f1))
    want = float(
        ((c1 == c2).all(axis=1) & (f1 == f2).all(axis=1)).mean()
    )
    assert got == pytest.approx(want, abs=1e-12)
    # the fixed-point property should hold for the vast majority of points
    assert got > 0.5


def test_subquantizer_distortion(spark, fixture):
    model, emb, ids, X = fixture
    got = lopq_eval.subquantizer_distortion(emb, model)
    P = model.project_residuals(X, model.coarse_assign(X))
    sd = model.sub_dim
    want = np.zeros(model.M)
    for m in range(model.M):
        h, s = m // model.subs_per_half, m % model.subs_per_half
        Pm = P[:, h * model.half + s * sd : h * model.half + (s + 1) * sd]
        S = model.subs[m]
        d = (Pm**2).sum(1)[:, None] - 2 * Pm @ S.T + (S**2).sum(1)[None, :]
        want[m] = d.min(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-8)
    assert got.shape == (model.M,) and (got >= -1e-9).all()

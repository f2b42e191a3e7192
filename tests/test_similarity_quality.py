"""Quality floors for the approximate similarity tiers (IVF) vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq.eval import brute_force_topk, recall_at_k
from columbiaimagesearch_spark.operators import ann_ivf
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


def test_ivf_index_partitions_all_rows(spark, emb_np):
    ids, X = emb_np
    centroids = ann_ivf.train_centroids(spark, SF_SMOKE)
    index = ann_ivf.build_index(spark, SF_SMOKE, centroids)
    assert index.count() == len(ids)
    cells = index.groupBy("cell").count().collect()
    assert 1 <= len(cells) <= ann_ivf.N_CELLS
    # spark assignment == numpy assignment
    d = (X**2).sum(1)[:, None] - 2 * X @ centroids.T + (centroids**2).sum(1)[None, :]
    expected = {int(i): int(c) for i, c in zip(ids, d.argmin(axis=1))}
    got = {int(r["id"]): int(r["cell"]) for r in index.collect()}
    assert got == expected


def test_ivf_recall_floor(spark, emb_np):
    ids, X = emb_np
    centroids = ann_ivf.train_centroids(spark, SF_SMOKE)
    index = ann_ivf.build_index(spark, SF_SMOKE, centroids)
    queries = [(int(ids[i]), X[i]) for i in range(8)]
    res = ann_ivf.ivf_search(spark, index, centroids, queries, nprobe=6, k=10)
    retrieved: dict[int, list[int]] = {}
    for r in res.orderBy("qid", "rank").collect():
        retrieved.setdefault(r["qid"], []).append(r["id"])
    truth = {int(ids[i]): t for i, t in enumerate(brute_force_topk(X[:8], X, ids, 10))}
    rec = recall_at_k(retrieved, truth, 10)
    assert rec >= 0.6, f"IVF recall@10 {rec} below floor"
    # probing ALL cells must recover brute force exactly
    res_all = ann_ivf.ivf_search(
        spark, index, centroids, queries, nprobe=ann_ivf.N_CELLS, k=10
    )
    retrieved_all: dict[int, list[int]] = {}
    for r in res_all.orderBy("qid", "rank").collect():
        retrieved_all.setdefault(r["qid"], []).append(r["id"])
    assert retrieved_all == truth


def test_ivf_registry_entry(spark):
    from columbiaimagesearch_spark import registry

    df = registry.all_specs()["ann_ivf_topk"].builder(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 8 * 10
    assert df.columns == ["qid", "rank", "id", "dist"]
    # rank-1 is the query itself at distance 0
    for r in rows:
        if r["rank"] == 1:
            assert r["id"] == r["qid"] and r["dist"] == 0.0


def test_connected_components_hand_graph(spark):
    from columbiaimagesearch_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    # components: {0,1,2,3} via chain, {5,6} pair, singletons 4,7,8,9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (0, 1), (5, 6)], "doc_a bigint, doc_b bigint"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_dedup_cluster_stats_consistent_with_components(spark):
    """dedup_cluster_stats (r10) must be the exact per-cluster aggregation
    of dedup_components' labeling joined with doc lengths: same multi-doc
    components, sizes matching cluster_size, and dup_chars = total minus
    the representative's chars (component IS the min doc_id, so its row
    always exists)."""
    from columbiaimagesearch_spark import registry
    from columbiaimagesearch_spark.sources import load_table

    specs = registry.all_specs()
    stats = {
        r["component"]: r
        for r in specs["dedup_cluster_stats"].builder(spark, SF_SMOKE).collect()
    }
    labels = specs["dedup_components"].builder(spark, SF_SMOKE).collect()
    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    want: dict[int, dict] = {}
    for r in labels:
        if r["cluster_size"] >= 2:
            w = want.setdefault(
                r["component"], {"n_docs": 0, "total_chars": 0}
            )
            w["n_docs"] += 1
            w["total_chars"] += lens[r["doc_id"]]
    assert set(stats) == set(want)
    for comp, w in want.items():
        s = stats[comp]
        assert s["n_docs"] == w["n_docs"]
        assert s["total_chars"] == w["total_chars"]
        assert s["dup_chars"] == w["total_chars"] - lens[comp]
        assert 0 < s["dup_chars"] < s["total_chars"]


def test_ann_cosine_matmul_matches_hof_form(spark):
    """The registered Arrow-matmul brute-force top-k and the JVM-HOF twin
    must agree bit-for-bit after the 4dp round — same ranks, ids, scores."""
    from columbiaimagesearch_spark.operators.similarity import (
        ann_cosine_topk,
        ann_cosine_topk_hof,
    )

    a = sorted(
        tuple(r) for r in ann_cosine_topk(spark, SF_SMOKE).collect()
    )
    b = sorted(
        tuple(r) for r in ann_cosine_topk_hof(spark, SF_SMOKE).collect()
    )
    assert a == b


def test_cosine_is_zero_safe_in_both_engines(spark, duck_smoke):
    """Review r13: 0/0 = NaN, and NaN sorts ABOVE every double in both
    Spark and DuckDB — an unguarded cosine would crown a zero vector
    rank-1 in every cos-desc window and flag it as everyone's near-dup,
    the exact inverse of the l2_normalize_rows contract. Both the Spark
    HOF _cosine and the shared _COS_SQL must return exactly 0.0 against
    a zero vector, and a valid value between nonzero vectors."""
    import math

    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators.similarity import _COS_SQL, _cosine

    df = spark.createDataFrame(
        [
            Row(a=[0.0, 0.0], b=[1.0, 2.0]),
            Row(a=[0.0, 0.0], b=[0.0, 0.0]),
            Row(a=[3.0, 4.0], b=[3.0, 4.0]),
        ]
    )
    got = [
        r["c"] for r in df.select(_cosine(F.col("a"), F.col("b")).alias("c")).collect()
    ]
    assert got[0] == 0.0 and got[1] == 0.0
    assert abs(got[2] - 1.0) < 1e-12
    assert not any(math.isnan(x) for x in got)

    sql = duck_smoke.execute(f"""
        SELECT {_COS_SQL.format(a="a", b="b")} AS c
        FROM (VALUES ([0.0, 0.0]::DOUBLE[], [1.0, 2.0]::DOUBLE[]),
                     ([3.0, 4.0]::DOUBLE[], [3.0, 4.0]::DOUBLE[])) t(a, b)
    """).fetchall()
    assert sql[0][0] == 0.0
    assert abs(sql[1][0] - 1.0) < 1e-12


def test_derive_lsh_knobs_rejects_recall_one(spark):
    """Review r13: recall=1.0 hit an opaque math-domain error inside
    bands_needed; the contract check now names the exhaustive paths."""
    from columbiaimagesearch_spark.operators.similarity import derive_lsh_knobs

    with pytest.raises(ValueError, match="recall must be in"):
        derive_lsh_knobs(10_000, recall=1.0)
    with pytest.raises(ValueError, match="recall must be in"):
        derive_lsh_knobs(10_000, recall=0.0)
    bands, bits = derive_lsh_knobs(10_000, recall=0.9)  # valid still works
    assert bands > 0 and bits > 0

"""API facade: nested ranked output, rerank + near-dup options."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.api import similarity_search
from columbiaimagesearch_spark.sources import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def queries_np(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .where(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r["vec_id"]), np.array(r["embedding"])) for r in rows]


def test_output_structure_and_order(spark, queries_np):
    out = similarity_search(spark, SF_SMOKE, queries_np, max_returned=5)
    assert out["search_mode"] == "rerank"
    assert [q["query_id"] for q in out["queries"]] == [0, 1, 2]
    for q in out["queries"]:
        si = q["similar_items"]
        assert q["number_similar"] == len(si["ids"]) == 5
        # exact rerank: the query vector itself ranks first at distance 0
        assert si["ids"][0] == q["query_id"]
        assert si["distances"][0] == pytest.approx(0.0)
        assert si["distances"] == sorted(si["distances"])


def test_near_dup_filter_tightens(spark, queries_np):
    loose = similarity_search(spark, SF_SMOKE, queries_np, max_returned=8)
    tight = similarity_search(
        spark, SF_SMOKE, queries_np, max_returned=8,
        near_dup=True, near_dup_th=1e-6,
    )
    for lq, tq in zip(loose["queries"], tight["queries"]):
        assert tq["number_similar"] <= lq["number_similar"]
        # with an epsilon threshold only the query itself survives
        assert tq["similar_items"]["ids"] == [tq["query_id"]]


def test_adc_mode_runs_without_vectors(spark, queries_np):
    out = similarity_search(spark, SF_SMOKE, queries_np, max_returned=4, rerank=False)
    assert out["search_mode"] == "adc"
    for q in out["queries"]:
        assert q["number_similar"] == 4
        assert q["similar_items"]["distances"] == sorted(
            q["similar_items"]["distances"]
        )


@pytest.fixture(scope="module")
def domain_images(spark):
    from columbiaimagesearch_spark.sources import fixtures

    return fixtures.generate(n_images=200).to_spark(spark)["images"]


def test_search_by_image_self_retrieval(spark, domain_images):
    """The reference's end-to-end sanity property: an indexed image queried
    by its own bytes comes back at rank 1 with distance 0."""
    from columbiaimagesearch_spark.api import search_by_image

    rows = domain_images.orderBy("sha1").limit(3).collect()
    queries = [(r["sha1"], bytes(r["content"])) for r in rows]
    out = search_by_image(spark, domain_images, queries, max_returned=5)
    assert set(out) == {r["sha1"] for r in rows}
    for sha1, res in out.items():
        assert res["sha1s"][0] == sha1, f"self not at rank 1 for {sha1}"
        assert res["distances"][0] == 0.0
        assert len(res["sha1s"]) == 5


def test_search_by_image_face_mode(spark, domain_images):
    """Face mode: every detected query face probes the face index with its
    own vector (results keyed by face index); a query face that exists in
    the index retrieves its own (sha1, bbox) item at distance 0."""
    from columbiaimagesearch_spark.api import search_by_image
    from columbiaimagesearch_spark.multimodal.images import toy_face_detector

    rows = domain_images.orderBy("sha1").limit(12).collect()
    # pick query images that actually carry faces under the toy detector
    with_faces = [
        r for r in rows if len(toy_face_detector(bytes(r["content"]))) > 0
    ][:2]
    assert with_faces, "fixture must contain images with detected faces"
    queries = [(r["sha1"], bytes(r["content"])) for r in with_faces]
    out = search_by_image(spark, domain_images, queries, max_returned=3, mode="face")
    for r in with_faces:
        n_faces = len(toy_face_detector(bytes(r["content"])))
        per_face = out[r["sha1"]]
        assert set(per_face) == set(range(n_faces))
        boxes = [
            [int(c) for c in b[:4]]
            for b in toy_face_detector(bytes(r["content"]))
        ]
        for fi, res in per_face.items():
            assert res["distances"][0] == 0.0  # own face at rank 1
            assert res["sha1s"][0] == r["sha1"]
            # detected bbox travels with each face's results (the
            # reference's per-face QueryFace, output_mapping.py:139)
            assert res["bbox"] == boxes[fi]


def test_search_by_image_driver_collects_bounded(spark, domain_images, monkeypatch):
    """Scale guard (VERDICT r4 #1): the query path must never collect the
    full index to the driver. The ONLY index-sized collect allowed is the
    bounded nb_train subsample (it carries an explicit GlobalLimit); result
    metadata resolution is a distributed join collecting O(queries * k)."""
    from pyspark.sql import DataFrame

    from columbiaimagesearch_spark.api import search_by_image

    real_collect = DataFrame.collect
    observed: list[tuple[int, str]] = []

    def spy(self):
        rows = real_collect(self)
        plan = self._jdf.queryExecution().optimizedPlan().toString()
        observed.append((len(rows), plan))
        return rows

    rows = real_collect(domain_images.orderBy("sha1").limit(2))
    queries = [(r["sha1"], bytes(r["content"])) for r in rows]
    monkeypatch.setattr(DataFrame, "collect", spy)
    out = search_by_image(spark, domain_images, queries, max_returned=3)
    monkeypatch.undo()
    assert set(out) == {r["sha1"] for r in rows}

    # fixture index is ~200 features; anything >=100 rows is index-sized
    # (queries*k = 6, per-partition count rows <= 32)
    index_sized = [(n, p) for n, p in observed if n >= 100]
    assert len(index_sized) <= 1, f"collect sizes: {[n for n, _ in observed]}"
    for n, plan in index_sized:
        assert "GlobalLimit" in plan, (
            f"unbounded full-index collect of {n} rows:\n{plan}"
        )


def test_search_by_image_zero_extractions_shape(spark, domain_images):
    """Zero successful extractions (review r14): the early return's shape
    must match the normal path's per-mode value type — full_image callers
    index result[name]["sha1s"] and get empty lists; face mode's per-name
    value stays a (empty) face_idx dict."""
    from columbiaimagesearch_spark.api import search_by_image

    # local class: cloudpickle ships it by value to the executors (a
    # module-level class in tests/ would be pickled by reference and fail
    # to import inside the Spark Python worker)
    class _AlwaysFailingModel:
        def featurize_full(self, data: bytes) -> np.ndarray:
            raise RuntimeError("decode failed")

        def detect(self, data: bytes):
            return []

        def featurize_face(self, data: bytes, bbox):
            raise RuntimeError("decode failed")

    rows = domain_images.orderBy("sha1").limit(2).collect()
    queries = [(r["sha1"], bytes(r["content"])) for r in rows]
    out = search_by_image(
        spark, domain_images.limit(5), queries, max_returned=3,
        model_factory=_AlwaysFailingModel,
    )
    assert out == {r["sha1"]: {"sha1s": [], "distances": []} for r in rows}

    out_face = search_by_image(
        spark, domain_images.limit(5), queries, max_returned=3, mode="face",
        model_factory=_AlwaysFailingModel,
    )
    assert out_face == {r["sha1"]: {} for r in rows}


def test_search_by_image_detect_only_skips_corpus(spark, domain_images):
    """detect_only (reference api.py:40-41, generic_searcher.py:381):
    detection runs on the query images, featurize + search skip — and the
    corpus relation is never touched (images=None proves no extraction,
    train or encode job ran). Output: per-face bbox + the empty result
    entry; full_image mode ignores the option like the reference's
    detector-less flow."""
    from columbiaimagesearch_spark.api import search_by_image
    from columbiaimagesearch_spark.multimodal.images import toy_face_detector

    rows = domain_images.orderBy("sha1").limit(12).collect()
    with_faces = [
        r for r in rows if len(toy_face_detector(bytes(r["content"]))) > 0
    ][:2]
    assert with_faces, "fixture must contain images with detected faces"
    queries = [(r["sha1"], bytes(r["content"])) for r in with_faces]

    out = search_by_image(
        spark, None, queries, mode="face", detect_only=True
    )
    for r in with_faces:
        boxes = [
            [int(c) for c in b[:4]]
            for b in toy_face_detector(bytes(r["content"]))
        ]
        assert out[r["sha1"]] == {
            fi: {"bbox": b, "sha1s": [], "distances": []}
            for fi, b in enumerate(boxes)
        }

    # full_image mode: detect_only is a no-op, the search runs normally
    out_full = search_by_image(
        spark, domain_images.orderBy("sha1").limit(12),
        queries[:1], max_returned=3, detect_only=True,
    )
    name = queries[0][0]
    assert out_full[name]["sha1s"][0] == name
    assert out_full[name]["distances"][0] == 0.0

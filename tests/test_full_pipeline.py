"""The reference user's whole production loop on this engine, end-to-end:

ingest messages -> claim update batches (ST1-ST4) -> feature extraction
(V14/V17) -> LOPQ encode + incremental index refresh (V9/ST6) -> ANN search
finds the newly ingested items (T2/J6/V10). Mirrors the reference's
pipeline composition (SURVEY §3: kafka ingester -> extraction checker ->
extraction processor -> searcher refresh), which no single-operator test
exercises as one chain.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from columbiaimagesearch_spark.lopq.model import LOPQModel
from columbiaimagesearch_spark.lopq.refresh import refresh_codes, serving_snapshot
from columbiaimagesearch_spark.lopq.search import search
from columbiaimagesearch_spark.multimodal.images import (
    run_extraction,
    toy_full_image_featurizer,
)
from columbiaimagesearch_spark.streaming.ingest import run_ingest_stateful


def _content(sha1: str) -> bytes:
    return b"IMG:" + sha1.encode()


def _drop_msgs(msg_dir, name, sha1s):
    with open(msg_dir / name, "w") as fh:
        for s in sha1s:
            fh.write(json.dumps({"sha1": s, "s3_url": f"https://x/{s}.jpg"}) + "\n")


def _ingest_extract_refresh(spark, msg_dir, ledger_dir, ckpt, codes_dir, model):
    """One turn of the loop; returns the update_ids newly indexed."""
    sink = run_ingest_stateful(
        spark, str(msg_dir), str(ledger_dir), str(ckpt),
        batch_size=20, max_delay_ms=10**9, date_str="2024-04-01",
    )
    claimed = spark.read.parquet(sink.images_dir)
    # attach bytes (stand-in for the reference's image download step) and
    # run the extraction stage over the claimed rows
    content = F.concat(F.lit(b"IMG:"), F.encode("sha1", "utf-8"))
    feats = run_extraction(
        claimed.select("sha1", content.alias("content"), "update_id"),
        content_col="content",
    )
    feats = (
        feats.where(F.col("failed") == 0)
        .join(claimed.select("sha1", "update_id"), "sha1")
        .select(
            F.substring("sha1", 6, 4).cast("bigint").alias("vec_id"),
            F.col("feature").alias("embedding"),
            "update_id",
        )
    )
    return refresh_codes(spark, str(codes_dir), feats, model)


@pytest.fixture(scope="module")
def model():
    rng = np.random.RandomState(7)
    X = rng.randn(400, 32)
    return LOPQModel.fit(X, V=2, M=4, K=16, seed=7)


def test_ingest_to_search_loop(spark, tmp_path_factory, model):
    base = tmp_path_factory.mktemp("loop")
    msg_dir = base / "msgs"; msg_dir.mkdir()
    ledger, ckpt, codes = base / "ledger", base / "ckpt", base / "codes"

    sha1s = [f"SHA1_{i:04d}" for i in range(40)]
    _drop_msgs(msg_dir, "part-000.jsonl", sha1s)
    added = _ingest_extract_refresh(spark, msg_dir, ledger, ckpt, codes, model)
    assert added == [
        "index_update_toy_feat_full_image_2024-04-01_000",
        "index_update_toy_feat_full_image_2024-04-01_001",
    ]
    assert serving_snapshot(spark, str(codes)).count() == 40

    # search for an ingested image by its own feature: top-1 is itself
    probe_sha = sha1s[7]
    q = toy_full_image_featurizer(_content(probe_sha)).astype(np.float64)
    res = search(
        spark, serving_snapshot(spark, str(codes)), model, [(7, q)],
        quota=40, k=3,
    ).orderBy("rank").collect()
    # ADC dist to itself is the quantization residual, not 0 — identity is
    # the contract: the ingested item is retrievable as its own top-1
    assert res and res[0]["id"] == 7

    # second turn: 20 new images + 10 redelivered -> exactly one new update,
    # refresh indexes ONLY it, search now finds a new item too
    _drop_msgs(
        msg_dir, "part-001.jsonl",
        [f"SHA1_{i:04d}" for i in range(30, 60)],
    )
    added2 = _ingest_extract_refresh(spark, msg_dir, ledger, ckpt, codes, model)
    assert added2 == ["index_update_toy_feat_full_image_2024-04-01_002"]
    assert serving_snapshot(spark, str(codes)).count() == 60

    q2 = toy_full_image_featurizer(_content("SHA1_0055")).astype(np.float64)
    res2 = search(
        spark, serving_snapshot(spark, str(codes)), model, [(55, q2)],
        quota=60, k=1,
    ).collect()
    assert res2[0]["id"] == 55

    # idempotence: a third turn with no new input refreshes nothing
    added3 = _ingest_extract_refresh(spark, msg_dir, ledger, ckpt, codes, model)
    assert added3 == []
    assert serving_snapshot(spark, str(codes)).count() == 60

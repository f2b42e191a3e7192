"""Streamed embedding near-dup ≡ batch emb_lsh_near_dup_pairs, exactly.

The incremental step buckets with the same elementwise LSH kernel and
verifies with the same per-pair elementwise cosine, so the accumulated pair
set over ANY chunking must equal the batch operator's output as an exact
set of (vec_a, vec_b, cos_sim) tuples — including the rounded score."""

from __future__ import annotations

from pyspark.sql import functions as F

from columbiaimagesearch_spark.operators.similarity import emb_lsh_near_dup_pairs
from columbiaimagesearch_spark.sources import load_table
from columbiaimagesearch_spark.streaming import emb_dedup_stream as eds

from conftest import SF_SMOKE


def _vec_df(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_streamed_chunks_equal_batch(spark, tmp_path):
    state = str(tmp_path / "state")
    vecs = _vec_df(spark)
    n = vecs.count()
    chunk = (n + 3) // 4
    admitted = 0
    for i in range(4):
        batch = vecs.where(
            (F.col("vec_id") >= i * chunk) & (F.col("vec_id") < (i + 1) * chunk)
        )
        admitted += eds.emb_dedup_batch_step(spark, batch, state)
    assert admitted == n

    got = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in eds.read_pairs(spark, state).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in emb_lsh_near_dup_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_replayed_batch_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    vecs = _vec_df(spark).where(F.col("vec_id") < 100)
    assert eds.emb_dedup_batch_step(spark, vecs, state) == 100
    before = eds.read_pairs(spark, state).count()
    # crash-replay: the same batch again admits nothing and adds no pairs
    assert eds.emb_dedup_batch_step(spark, vecs, state) == 0
    assert eds.read_pairs(spark, state).count() == before


def test_stream_wrapper_drains_drops(spark, tmp_path):
    import json

    src = tmp_path / "drops"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = _vec_df(spark).where(F.col("vec_id") < 60).collect()
    for i, part in enumerate([rows[:30], rows[30:]]):
        with open(src / f"drop{i}.jsonl", "w") as fh:
            for r in part:
                fh.write(
                    json.dumps({"vec_id": r["vec_id"], "v": list(r["v"])}) + "\n"
                )
    eds.run_incremental_emb_dedup(spark, str(src), state, ckpt)
    assert eds.read_vectors(spark, state).count() == 60

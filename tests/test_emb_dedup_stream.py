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


def test_crash_between_bands_and_claim_replays_clean(spark, tmp_path, monkeypatch):
    """Crash AFTER the bands append but BEFORE the vectors (claim) append:
    the replayed batch meets its own band rows in state. The replay must
    not emit self-pairs (vec_a == vec_b), must not duplicate band rows,
    and the final pair set must equal an uncrashed run's."""
    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    vecs = _vec_df(spark)
    b1 = vecs.where(F.col("vec_id") < 100)
    b2 = vecs.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200))

    clean = str(tmp_path / "clean")
    eds.emb_dedup_batch_step(spark, b1, clean)
    eds.emb_dedup_batch_step(spark, b2, clean)
    want = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in eds.read_pairs(spark, clean).collect()
    }

    state = str(tmp_path / "crashed")
    eds.emb_dedup_batch_step(spark, b1, state)
    real_parquet = DataFrameWriter.parquet

    def crash_on_claim(self, path, *a, **kw):
        if path.rstrip("/").endswith("vectors"):
            raise RuntimeError("simulated crash before claim append")
        return real_parquet(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crash_on_claim)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eds.emb_dedup_batch_step(spark, b2, state)
    monkeypatch.undo()

    assert eds.emb_dedup_batch_step(spark, b2, state) == 100  # full replay
    pairs = eds.read_pairs(spark, state)
    assert pairs.where(F.col("vec_a") == F.col("vec_b")).count() == 0
    got = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in pairs.collect()}
    assert got == want
    # band rows did not duplicate: one row per (vector, band)
    bands_cnt = eds._read_state(spark, state, "bands", eds._BANDS_SCHEMA).count()
    assert bands_cnt == 200 * eds.LSH_BANDS


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

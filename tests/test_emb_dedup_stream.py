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


def test_state_join_sizing_is_result_invariant(spark, tmp_path, monkeypatch):
    """r17 (VERDICT r16 #7): the state-side candidate join widens to the
    computed width once the counted state band rows exceed the per-task
    target — forced here by shrinking the target so every batch after the
    first repartitions — and the accumulated pair set stays identical to
    the batch operator's (partitioning can never change which (band, key)
    buckets collide)."""
    state = str(tmp_path / "state")
    vecs = _vec_df(spark)
    n = vecs.count()
    # tiny target: any non-empty state trips the widening on batch 2+
    monkeypatch.setattr(eds, "STATE_BANDS_ROWS_PER_TASK", 8)
    assert (
        min(-(-10_000 // eds.STATE_BANDS_ROWS_PER_TASK),
            eds.STATE_BANDS_MAX_PARTITIONS)
        == 1250
    )
    chunk = (n + 1) // 2
    admitted = 0
    for i in range(2):
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


def test_derived_knobs_scale_with_corpus():
    """A 10x larger corpus gets MORE bits with no knob change, and bands
    rise to hold the recall floor (VERDICT r5 next-round #3)."""
    import math

    from columbiaimagesearch_spark.operators.similarity import (
        LSH_RECALL,
        NEAR_DUP_COS,
        derive_lsh_knobs,
    )

    # at a production near-dup threshold (cos >= 0.9): bits grow with the
    # corpus and the expected bucket stays near the target
    knobs = {n: derive_lsh_knobs(n, threshold=0.9) for n in
             (10_000, 100_000, 1_000_000)}
    bits_seq = [knobs[n][1] for n in (10_000, 100_000, 1_000_000)]
    assert bits_seq[0] < bits_seq[1] < bits_seq[2]
    assert 100_000 / 2 ** knobs[100_000][1] <= 2 * 64
    p_hi = 1.0 - math.acos(0.9) / math.pi
    for bands, bits in knobs.values():
        recall = 1.0 - (1.0 - p_hi**bits) ** bands
        assert recall >= LSH_RECALL - 1e-9, (bands, bits, recall)

    # at the fixture's LOW threshold the bands cap binds: bits back off so
    # the recall floor still holds (recall is the contract; bucket size
    # degrades, never silent pair loss)
    p_lo = 1.0 - math.acos(NEAR_DUP_COS) / math.pi
    for n in (10_000, 1_000_000):
        bands, bits = derive_lsh_knobs(n)
        recall = 1.0 - (1.0 - p_lo**bits) ** bands
        assert recall >= LSH_RECALL - 1e-9, (bands, bits, recall)


def test_auto_knobs_equal_explicit_derived(spark):
    """emb_lsh_pairs_from with omitted knobs == the same call with the
    derived knobs passed explicitly (the auto path is a derivation, not a
    different algorithm)."""
    from columbiaimagesearch_spark.operators.similarity import (
        derive_lsh_knobs,
        emb_lsh_pairs_from,
    )

    vecs = _vec_df(spark)
    bands, bits = derive_lsh_knobs(vecs.count())
    auto = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in emb_lsh_pairs_from(vecs).collect()
    }
    explicit = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in emb_lsh_pairs_from(vecs, bands=bands, bits=bits).collect()
    }
    assert auto == explicit and len(auto) > 0


def test_stream_pins_derived_knobs_and_rejects_conflicts(spark, tmp_path):
    """First step with expected_corpus derives + pins the knobs in state
    metadata; later steps inherit them with NO knob arguments; a
    conflicting explicit knob raises instead of silently mixing hash
    families; streamed ≡ batch at the SAME derived calibration."""
    import json

    import pytest

    from columbiaimagesearch_spark.operators.similarity import (
        derive_lsh_knobs,
        emb_lsh_pairs_from,
    )

    vecs = _vec_df(spark)
    n = vecs.count()
    state = str(tmp_path / "state")
    b1 = vecs.where(F.col("vec_id") < 200)
    b2 = vecs.where(F.col("vec_id") >= 200)
    eds.emb_dedup_batch_step(spark, b1, state, expected_corpus=n)

    exp_bands, exp_bits = derive_lsh_knobs(n)
    with open(eds._knobs_path(state)) as fh:
        pinned = json.load(fh)
    assert (pinned["bands"], pinned["bits"]) == (exp_bands, exp_bits)

    # knobless later step inherits the pin
    eds.emb_dedup_batch_step(spark, b2, state)
    got = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in eds.read_pairs(spark, state).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in emb_lsh_pairs_from(
            vecs, bands=exp_bands, bits=exp_bits
        ).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="pinned"):
        eds.emb_dedup_batch_step(spark, b2, state, bits=exp_bits + 1)


def test_legacy_state_without_knobs_file(spark, tmp_path):
    """A state dir holding band rows but no lsh_knobs.json (created before
    knob pinning): a knobless step must REFUSE (pinning today's defaults
    would hash with a different family than the resident bands — silently
    missed pairs), while an explicit re-pin of the original knobs
    proceeds and records them."""
    import json
    import os

    import pytest

    vecs = _vec_df(spark)
    state = str(tmp_path / "state")
    eds.emb_dedup_batch_step(spark, vecs.where(F.col("vec_id") < 100), state,
                             bands=6, bits=4)
    os.remove(eds._knobs_path(state))  # simulate the pre-pinning layout

    with pytest.raises(ValueError, match="no\\s+lsh_knobs.json"):
        eds.emb_dedup_batch_step(
            spark, vecs.where(F.col("vec_id") >= 100), state
        )
    # explicit re-pin of the original calibration recovers the stream
    eds.emb_dedup_batch_step(
        spark, vecs.where(F.col("vec_id") >= 100), state, bands=6, bits=4
    )
    with open(eds._knobs_path(state)) as fh:
        assert json.load(fh)["bands"] == 6
    # and the knobs file is written atomically (no .tmp residue)
    assert not os.path.exists(eds._knobs_path(state) + ".tmp")


def test_derive_knobs_warns_on_unreachable_recall():
    """When even min_bits cannot reach the recall floor within max_bands,
    the clamp is a RECALL MISS — derive_lsh_knobs must say so (a silent
    clamp loses pairs while claiming the floor)."""
    import pytest

    from columbiaimagesearch_spark.operators.similarity import derive_lsh_knobs

    with pytest.warns(RuntimeWarning, match="caps the achieved"):
        derive_lsh_knobs(1_000_000, threshold=-0.9)


def test_stream_restart_reloads_derived_knobs(spark, tmp_path):
    """DERIVED knobs through the STREAM wrapper, across a restart (VERDICT
    r6 next-round #5): the first run derives (bands, bits) from
    expected_corpus and pins them; a restarted run against the same state
    dir — even one passing a GROWN expected_corpus, as a long-lived
    pipeline would after the corpus estimate is revised — must reload the
    pinned knobs rather than re-derive (a silent re-derivation would band
    new batches with a different hash family than the resident state:
    missed pairs, no error). Accumulated pairs must equal the batch
    operator at the pinned calibration."""
    import json

    from columbiaimagesearch_spark.operators.similarity import (
        derive_lsh_knobs,
        emb_lsh_pairs_from,
    )

    src = tmp_path / "drops"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    vecs = _vec_df(spark)
    n = vecs.count()
    rows = vecs.collect()

    def drop(name: str, part) -> None:
        with open(src / name, "w") as fh:
            for r in part:
                fh.write(
                    json.dumps({"vec_id": r["vec_id"], "v": list(r["v"])}) + "\n"
                )

    half = len(rows) // 2
    drop("drop0.jsonl", rows[:half])
    eds.run_incremental_emb_dedup(
        spark, str(src), state, ckpt, expected_corpus=n
    )
    exp_bands, exp_bits = derive_lsh_knobs(n)
    with open(eds._knobs_path(state)) as fh:
        pinned_first = json.load(fh)
    assert (pinned_first["bands"], pinned_first["bits"]) == (exp_bands, exp_bits)

    # restart: new files land, the stream comes back up against the SAME
    # state dir + checkpoint with a 100x-grown corpus estimate
    drop("drop1.jsonl", rows[half:])
    eds.run_incremental_emb_dedup(
        spark, str(src), state, ckpt, expected_corpus=n * 100
    )
    with open(eds._knobs_path(state)) as fh:
        assert json.load(fh) == pinned_first  # reloaded, not re-derived
    # sanity: the grown estimate WOULD have derived different knobs, so
    # the equality above proves the pin won, not that derivation is flat
    assert derive_lsh_knobs(n * 100) != (exp_bands, exp_bits)

    got = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in eds.read_pairs(spark, state).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in emb_lsh_pairs_from(
            vecs, bands=exp_bands, bits=exp_bits
        ).collect()
    }
    assert got == want and eds.read_vectors(spark, state).count() == n


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


def test_bucket_telemetry_reports_true_max(spark):
    """LshBucketStats observes the real max (band, key) bucket size —
    cross-checked against a driver-side recount with the same kernel
    (VERDICT r7 #6: the skew metric a 100 TB run should export)."""
    import numpy as np

    from columbiaimagesearch_spark.operators.similarity import (
        LSH_BANDS,
        LSH_BITS,
        LSH_SEED,
        LshBucketStats,
        _lsh_band_keys,
        emb_lsh_pairs_from,
    )

    vecs = _vec_df(spark)
    stats = LshBucketStats(spark)
    out = emb_lsh_pairs_from(vecs, bands=LSH_BANDS, bits=LSH_BITS, stats=stats)
    out.write.format("noop").mode("overwrite").save()

    rows = vecs.collect()
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    keys = _lsh_band_keys(X, LSH_BANDS, LSH_BITS, LSH_SEED)
    expected_max = max(
        int(np.max(np.unique(keys[:, b], return_counts=True)[1]))
        for b in range(LSH_BANDS)
    )
    assert stats.max_bucket == expected_max
    assert stats.max_pairs_bucket == expected_max * (expected_max - 1) // 2


def test_degenerate_bucket_refuses_loudly(spark):
    """A bucket past max_bucket raises naming the blocked/IVF escape paths
    instead of silently running O(n^2): identical vectors land in ONE
    (band, key) bucket no matter the knobs — the skew LSH cannot spread."""
    import pytest
    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators.similarity import (
        LshBucketStats,
        emb_lsh_pairs_from,
    )

    clone = [1.0, 0.5, -0.25, 2.0]
    vecs = spark.createDataFrame(
        [Row(vec_id=i, v=clone) for i in range(120)]
    )
    with pytest.raises(Exception, match="emb_near_dup_pairs"):
        emb_lsh_pairs_from(
            vecs, bands=4, bits=8, max_bucket=50
        ).write.format("noop").mode("overwrite").save()

    # max_bucket=None disables the guard; telemetry still sees the flood
    stats = LshBucketStats(spark)
    n_pairs = emb_lsh_pairs_from(
        vecs, bands=4, bits=8, max_bucket=None, stats=stats
    ).count()
    assert stats.max_bucket == 120
    assert n_pairs == 120 * 119 // 2


def test_bucket_group_coarsening_is_invariant(spark, monkeypatch):
    """r14 group batching: the (band, key % shards) coarse grouping packs
    many real buckets per applyInPandas group — the pair set, cosines
    included, must be IDENTICAL at every coarseness, because the kernel
    splits the group back into exact (band, key) runs. Pin per-key
    grouping (LSH_GROUP_BUCKETS=1) against heavy coarsening (=1024) at
    knobs where the keyspace is large enough for shards to engage."""
    from columbiaimagesearch_spark.operators import similarity as sim

    vecs = _vec_df(spark)

    def pairs():
        return {
            (r["vec_a"], r["vec_b"], r["cos_sim"])
            for r in sim.emb_lsh_pairs_from(vecs, bands=6, bits=8).collect()
        }

    monkeypatch.setattr(sim, "LSH_GROUP_BUCKETS", 1)
    per_key = pairs()  # shards = 256 -> one group per key (old plan)
    # NB: LSH_GROUP_BUCKETS must stay BELOW the keyspace (256) or the
    # small-keyspace guard falls back to per-key grouping and this arm
    # re-tests the plan above (review r14 caught exactly that with 1024);
    # 255 -> shards = 256 // 255 = 1 -> one group per band, the maximal
    # coarsening the kernel supports
    monkeypatch.setattr(sim, "LSH_GROUP_BUCKETS", 255)
    coarse = pairs()
    monkeypatch.undo()
    assert per_key == pairs()  # default coarseness agrees too
    assert per_key == coarse
    assert per_key, "fixture should produce near-dup pairs at these knobs"


def test_oversize_split_mode_bounds_hot_buckets(spark):
    """oversize='split' (r16, VERDICT r15 #1): a corpus whose buckets blow
    past max_bucket runs to completion with bounded per-bucket work instead
    of refusing; the pair set is a subset of the exact (unbounded) run with
    IDENTICAL cos values on every kept pair, no duplicate pairs, and the
    documented recall trade stays small (the split drops a pair from one
    band only — other bands still catch it)."""
    from columbiaimagesearch_spark.operators import similarity as sim

    import numpy as np
    from pyspark.sql import Row

    # planted clone clusters at the PRODUCTION near-dup threshold (0.9 —
    # the regime split mode exists for; the fixture's 0.40 calibration
    # threshold has p_bit ~0.63 and belongs to the blocked path, where any
    # extra split bit sheds ~37% of true pairs by design)
    rnd = np.random.RandomState(7)
    rows = []
    vid = 0
    for _c in range(40):
        base = rnd.randn(16)
        base /= np.linalg.norm(base)
        for _m in range(10):
            v = base + 0.08 * rnd.randn(16)
            rows.append(Row(vec_id=vid, v=[float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows)

    def tuples(df):
        return {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in df.collect()}

    # bits=2 -> 4 keys/band: buckets ~100 rows, far above max_bucket=32,
    # so EVERY bucket takes the split path
    exact = tuples(
        sim.emb_lsh_pairs_from(
            vecs, bands=4, bits=2, threshold=0.9, max_bucket=None
        )
    )
    split_rows = sim.emb_lsh_pairs_from(
        vecs, bands=4, bits=2, threshold=0.9, max_bucket=32, oversize="split"
    ).collect()
    split = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in split_rows}
    assert len(split_rows) == len(split)  # global distinct: no dup pairs
    assert split <= exact  # never invents a pair, never perturbs a cosine
    assert len(exact) > 1000  # the 40x10 clusters plant ~1800 true pairs
    # band-OR rescue: each pair gets `bands` chances and split-bit
    # agreement at cos>=0.9 is ~0.92/bit — losing a pair in EVERY band is
    # rare (model ~0.99 recall; 0.9 leaves slack for the seed draw)
    assert len(split) >= 0.9 * len(exact), (len(split), len(exact))


def test_oversize_split_refuses_unsplittable_clones(spark):
    """Identical vectors produce identical split bits at every depth — the
    qualifying-pair OUTPUT is inherently O(n^2), so split mode refuses
    loudly (naming the dedup escape) instead of pretending a bound. The
    flood must exceed LSH_SPLIT_EXACT_CAP: up to the cap a stuck
    sub-bucket is verified exactly (bounded work), because small unlucky
    sub-buckets of DISTINCT vectors can also share every split bit."""
    import pytest
    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators.similarity import (
        LSH_SPLIT_EXACT_CAP,
        emb_lsh_pairs_from,
    )

    clone = [1.0, 0.5, -0.25, 2.0]
    vecs = spark.createDataFrame(
        [Row(vec_id=i, v=clone) for i in range(LSH_SPLIT_EXACT_CAP + 200)]
    )
    with pytest.raises(Exception, match="no hyperplane family"):
        emb_lsh_pairs_from(
            vecs, bands=4, bits=8, max_bucket=50, oversize="split"
        ).write.format("noop").mode("overwrite").save()


def test_oversize_split_exact_fallback_below_cap(spark):
    """A clone cluster that exceeds max_bucket at every split depth but
    fits LSH_SPLIT_EXACT_CAP is verified exactly instead of refused —
    every in-cluster pair is emitted once with its true cosine (the
    hypothesis fuzz found the old always-refuse branch rejecting 3 random
    vectors that happened to share all 16 extra sign bits)."""
    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators.similarity import (
        emb_lsh_pairs_from,
    )

    clone = [1.0, 0.5, -0.25, 2.0]
    n = 60  # > max_bucket, far below the cap
    vecs = spark.createDataFrame([Row(vec_id=i, v=clone) for i in range(n)])
    got = emb_lsh_pairs_from(
        vecs, bands=4, bits=8, max_bucket=20, oversize="split"
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert len(got) == len(pairs)  # global distinct: no duplicates
    assert pairs == {
        (a, b) for a in range(n) for b in range(a + 1, n)
    }  # all n*(n-1)/2 clone pairs survive via the exact fallback
    assert all(r["cos_sim"] == 1.0 for r in got)


def test_oversize_rejects_unknown_mode(spark):
    import pytest

    from columbiaimagesearch_spark.operators.similarity import (
        emb_lsh_pairs_from,
    )

    with pytest.raises(ValueError, match="refuse.*split"):
        emb_lsh_pairs_from(_vec_df(spark), bands=4, bits=8, oversize="drop")

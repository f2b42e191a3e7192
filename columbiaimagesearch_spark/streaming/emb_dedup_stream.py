"""Incremental embedding near-dup — the streaming twin of
``emb_lsh_near_dup_pairs``.

A training pipeline ingests embeddings continuously (every new crawl drop
is featurized); near-dup pairs against EVERYTHING already ingested must not
recompute the corpus. Same shape as ``dedup_stream`` (the text MinHash
twin): the corpus state is the band table, so each arriving batch does

  1. sign-bit band keys for the NEW vectors only (the shared
     ``similarity._lsh_band_keys`` kernel — elementwise projections, so
     streamed and batch bucketing are bitwise identical);
  2. claim anti-join on vec_id (ST2/J3 idiom) — replays are idempotent;
  3. candidates = fresh bands ⋈ fresh bands ∪ fresh bands ⋈ state bands,
     (band, key) equi-joins only — the state side is never scanned
     pairwise;
  4. exact-cosine verify of the candidate pairs against the union vector
     table (per-pair elementwise kernel — bitwise equal to the batch
     operator's in-bucket form, which is what makes streamed ≡ batch an
     exact set equality, asserted in tests);
  5. append verified pairs + fresh bands; the vector table (the claim
     side) lands LAST — same append-order rule dedup_stream documents.

Per-batch cost is O(batch × bands + collisions) regardless of corpus size.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    LSH_BANDS,
    LSH_BITS,
    LSH_SEED,
    NEAR_DUP_COS,
    _lsh_band_keys,
)

VEC_SCHEMA = "vec_id long, v array<double>"
_BANDS_SCHEMA = "vec_id long, band int, key long"
_PAIRS_SCHEMA = "vec_a long, vec_b long, cos_sim double"

# r17 (VERDICT r16 #7): size the state-side candidate join like the batch
# operator sizes its banded exchange (similarity.LSH_BANDED_ROWS_PER_TASK).
# The rows here are (vec_id, band, key) INTS — ~30 B serialized, never
# vectors (the stream design's whole point) — so the same ~45 MB/task
# target admits ~1.5M rows per reduce task. At the session default of 32
# partitions the join is fine through ~48M state band rows (~2.5M vectors
# at 19 bands); past that the state side repartitions BOTH join inputs to
# the computed width on the join key, which the equi-join reuses (same
# exchange count, wider tasks-free-of-spill — the r16 1M batch lesson).
STATE_BANDS_ROWS_PER_TASK = 1_500_000
STATE_BANDS_MAX_PARTITIONS = 65536


def _state_path(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _read_state(
    spark: SparkSession, state_dir: str, name: str, schema: str
) -> DataFrame:
    path = _state_path(state_dir, name)
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        spark.catalog.refreshByPath(path)  # see dedup_stream._read_state
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def read_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated verified pairs; deduped on read (crash-replay residue is
    duplicate EDGES, same contract as dedup_stream.read_pairs)."""
    return _read_state(spark, state_dir, "pairs", _PAIRS_SCHEMA).dropDuplicates(
        ["vec_a", "vec_b"]
    )


def read_vectors(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_state(spark, state_dir, "vectors", VEC_SCHEMA)


def _band_rows_fn(bands: int, bits: int, seed: int):
    def _band_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(list(pdf["v"]), dtype=np.float64)
            keys = _lsh_band_keys(V, bands, bits, seed)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), bands),
                    "band": np.repeat(np.arange(bands), n),
                    "key": keys.T.ravel(),
                }
            )

    return _band_rows


def _verify_pairs_fn(threshold: float):
    """Per-pair elementwise cosine — the same per-row normalization and
    einsum dot as the batch operator's in-bucket kernel, so a pair verified
    here carries the bitwise-identical cos_sim."""

    def _verify_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.similarity import l2_normalize_rows

        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["va"]), dtype=np.float64)
            B = np.array(list(pdf["vb"]), dtype=np.float64)
            An = l2_normalize_rows(A)
            Bn = l2_normalize_rows(B)
            cos = np.einsum("ij,ij->i", An, Bn)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "cos_sim": np.round(cos[keep], 4),
                }
            )

    return _verify_pairs


def _knobs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "lsh_knobs.json")


def _resolve_knobs(
    state_dir: str,
    bands: int | None,
    bits: int | None,
    threshold: float,
    seed: int,
    expected_corpus: int | None,
) -> tuple[int, int]:
    """The banding knobs ARE state: the band table is keyed by them, so
    every step against one state dir must use the same (bands, bits,
    seed) — a silent knob change would make the new-old join compare keys
    from different hash families (missed pairs, no error). Resolution:

    1. a state dir that already pinned knobs wins — explicit args may
       only CONFIRM them (a conflict raises instead of corrupting state);
    2. explicit args pin on first use;
    3. ``expected_corpus`` derives (bands, bits) via
       :func:`~..operators.similarity.derive_lsh_knobs` and pins those —
       the self-scaling path (size to the corpus the stream will
       accumulate, not the first batch);
    4. otherwise the fixture constants pin (smoke-tier default)."""
    import json

    pinned = None
    try:
        with open(_knobs_path(state_dir)) as fh:
            pinned = json.load(fh)
    except FileNotFoundError:
        pass
    if pinned is None and (bands is None or bits is None):
        bands_path = _state_path(state_dir, "bands")
        if os.path.isdir(bands_path) and any(
            f.endswith(".parquet") for f in os.listdir(bands_path)
        ):
            # a state dir with resident band rows but no knobs file
            # predates knob pinning — silently pinning TODAY's defaults
            # would compare keys from a different hash family than the
            # resident state (missed pairs, no error)
            raise ValueError(
                f"state dir {state_dir} holds band rows but no "
                "lsh_knobs.json; pass the bands/bits/seed it was built "
                "with explicitly once to pin them"
            )
    if pinned is not None:
        for name, given in (("bands", bands), ("bits", bits), ("seed", seed)):
            if given is not None and given != pinned[name]:
                raise ValueError(
                    f"LSH knob {name}={given} conflicts with the state "
                    f"dir's pinned {name}={pinned[name]} — the band table "
                    "was built with the pinned calibration; start a new "
                    "state dir to re-calibrate"
                )
        return int(pinned["bands"]), int(pinned["bits"])
    if bands is None or bits is None:
        if expected_corpus is not None:
            from ..operators.similarity import derive_lsh_knobs

            d_bands, d_bits = derive_lsh_knobs(
                expected_corpus, threshold=threshold
            )
        else:
            d_bands, d_bits = LSH_BANDS, LSH_BITS
        bands = d_bands if bands is None else bands
        bits = d_bits if bits is None else bits
    os.makedirs(state_dir, exist_ok=True)
    # tmp + rename: a crash mid-dump must leave NO knobs file (retryable),
    # never a truncated one that wedges every later step on JSONDecodeError
    final = _knobs_path(state_dir)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"bands": int(bands), "bits": int(bits), "seed": int(seed),
             "threshold": float(threshold)},
            fh,
        )
    os.replace(tmp, final)
    return int(bands), int(bits)


def emb_dedup_batch_step(
    spark: SparkSession,
    vecs: DataFrame,
    state_dir: str,
    bands: int | None = None,
    bits: int | None = None,
    threshold: float = NEAR_DUP_COS,
    seed: int = LSH_SEED,
    expected_corpus: int | None = None,
) -> int:
    """One incremental step: near-dup ``vecs`` against state, append
    verified pairs + fresh state rows. Returns fresh vectors admitted.

    The banding knobs MUST match across every step against one state dir
    (the band table is the state) — enforced by :func:`_resolve_knobs`,
    which pins the first step's knobs in ``lsh_knobs.json`` and rejects
    conflicting explicit knobs later. Pass ``expected_corpus`` on the
    first step to size the calibration to the corpus the stream will
    accumulate (bits grow with it; the fixture constants remain the
    smoke-tier default): new-old candidates per batch are
    O(batch × bands × |state| / 2^bits)."""
    bands, bits = _resolve_knobs(
        state_dir, bands, bits, threshold, seed, expected_corpus
    )
    vecs = vecs.where(F.col("vec_id").isNotNull()).dropDuplicates(["vec_id"])
    state_vecs = read_vectors(spark, state_dir)
    fresh = vecs.join(state_vecs, "vec_id", "left_anti").persist()
    n_fresh = fresh.count()
    if n_fresh == 0:
        fresh.unpersist()
        return 0

    bands_fresh = fresh.mapInPandas(
        _band_rows_fn(bands, bits, seed), _BANDS_SCHEMA
    ).persist()
    bands_fresh.count()
    state_bands = _read_state(spark, state_dir, "bands", _BANDS_SCHEMA)

    # corpus-sized candidate join (see STATE_BANDS_ROWS_PER_TASK): the
    # state band table grows with the corpus while the session shuffle
    # width stays fixed — count it (cheap: int-only parquet scan) and
    # widen the one keyed exchange pair when the default would spill.
    # Both sides repartition on the JOIN key at the same width, so the
    # equi-join reuses the partitioning instead of adding an exchange.
    new_old_fresh, state_bands_j = bands_fresh, state_bands
    floor_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_state_bands = state_bands.count()
    want_p = min(
        -(-n_state_bands // STATE_BANDS_ROWS_PER_TASK),
        STATE_BANDS_MAX_PARTITIONS,
    )
    if want_p > floor_p:
        state_bands_j = state_bands.repartition(want_p, "band", "key")
        new_old_fresh = bands_fresh.repartition(want_p, "band", "key")

    new_new = (
        bands_fresh.alias("a")
        .join(bands_fresh.alias("b"), ["band", "key"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    new_old = (
        new_old_fresh.alias("n")
        .join(state_bands_j.alias("o"), ["band", "key"])
        # crash-replay guard: if a crash landed this batch's bands but not
        # its vectors (the claim table), the replayed batch meets its OWN
        # band rows here — without this filter that produces self-pairs
        # (vec_a == vec_b, cos = 1.0) that pass verify and poison the
        # pairs state forever (the batch operator never emits self-pairs).
        .where(F.col("n.vec_id") != F.col("o.vec_id"))
        .select(
            F.least(F.col("n.vec_id"), F.col("o.vec_id")).alias("vec_a"),
            F.greatest(F.col("n.vec_id"), F.col("o.vec_id")).alias("vec_b"),
        )
    )
    cands = new_new.unionByName(new_old).distinct()
    all_vecs = fresh.unionByName(state_vecs)
    joined = (
        cands.join(
            all_vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")),
            "vec_a",
        )
        .join(
            all_vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")),
            "vec_b",
        )
    )
    pairs = joined.mapInPandas(_verify_pairs_fn(threshold), _PAIRS_SCHEMA)

    # append order is load-bearing (see dedup_stream): the claim table
    # (vectors) lands LAST so a crash replays the whole batch
    pairs.write.mode("append").parquet(_state_path(state_dir, "pairs"))
    # second half of the crash-replay guard: a replayed batch whose bands
    # already landed must not append them again (duplicate band rows would
    # accumulate in state on every replay). Cost: one extra column-pruned
    # scan of state_bands' vec_id column per batch — the candidates join
    # above already scans the full state each batch, so this adds a
    # fraction, not a new asymptotic term; the per-batch cost stays
    # O(batch x bands + state + collisions).
    bands_to_append = bands_fresh.join(
        state_bands.select("vec_id").distinct(), "vec_id", "left_anti"
    )
    bands_to_append.write.mode("append").parquet(_state_path(state_dir, "bands"))
    fresh.write.mode("append").parquet(_state_path(state_dir, "vectors"))
    bands_fresh.unpersist()
    fresh.unpersist()
    return n_fresh


def run_incremental_emb_dedup(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    bands: int | None = None,
    bits: int | None = None,
    threshold: float = NEAR_DUP_COS,
    seed: int = LSH_SEED,
    expected_corpus: int | None = None,
) -> None:
    """Drain ``src_dir`` (JSONL vector drops, availableNow) through the
    incremental near-dup; offsets checkpoint with the query, the claim
    anti-join makes redeliveries no-ops. Banding knobs pin to the state
    dir on the first batch (derived from ``expected_corpus`` when given)
    and stay constant for its lifetime — see ``_resolve_knobs``."""
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: emb_dedup_batch_step(
                spark, batch_df, state_dir,
                bands=bands, bits=bits, threshold=threshold, seed=seed,
                expected_corpus=expected_corpus,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

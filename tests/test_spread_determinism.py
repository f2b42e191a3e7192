"""Spread-invariance: parallelize_scan must never change results.

The r6 scan-spreading work (sources/tables.py, SCALE.md §Scan parallelism)
repartitions single-split sources feeding CPU-heavy per-row work. That is
only sound for row-deterministic computations — this suite pins the
contract by running every spread-using registered query twice, with
``parallelize_scan`` active and stubbed to identity, and asserting the
row multisets are identical. A failure here means someone put a
partition-order-sensitive computation (float accumulation, arbitrary
tie-break) downstream of a spread scan.
"""

from __future__ import annotations

import pytest

from columbiaimagesearch_spark import registry
from columbiaimagesearch_spark.sources import tables as tables_mod

from conftest import SF_SMOKE

# every registered query whose builder (directly or via its library helpers)
# loads a spread relation — keep in sync with load_table(spread=True) call
# sites; test_covers_all_spread_call_sites below enforces the sync
SPREAD_QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_substring_spans",
    "dedup_ngram_jaccard_pairs",
    "dedup_components",
    "llm_decontaminate",
    "llm_fuzzy_decontaminate",
    "llm_contamination_report",
    "text_ngram_novelty",
    "llm_pii_scrub",
    "text_repetition_stats",
    "text_boilerplate_ngrams",
    "text_quality_score",
    "text_langid",
    "emb_lsh_near_dup_pairs",
    "llm_embedding_dedup",
    "llm_embedding_decontaminate",
    "lopq_eval_diagnostics",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SPREAD_QUERIES)
def test_spread_invariant(spark, name, monkeypatch):
    spec = registry.all_specs()[name]
    spread_rows = _rows(spec.builder(spark, SF_SMOKE))
    monkeypatch.setattr(
        tables_mod, "parallelize_scan", lambda df, cache_key=None: df
    )
    plain_rows = _rows(spec.builder(spark, SF_SMOKE))
    assert spread_rows == plain_rows


# exact spread=True call-site counts per module: a NEW call site (or a
# removal) changes a count and fails the tripwire below, forcing the
# developer to re-confirm SPREAD_QUERIES covers it — function-level
# coverage cannot silently drift inside an already-listed module
EXPECTED_SPREAD_SITES = {
    "operators/dedup.py": 5,
    "operators/hygiene.py": 8,  # +1 r8 fuzzy; +1 r9 report; +1 r10 novelty;
    # +1 r11 embedding decontamination (corpus branch)
    "operators/textstats.py": 2,
    "operators/similarity.py": 2,  # +1 r12 llm_embedding_dedup
    "lopq/queries.py": 1,
}


def test_covers_all_spread_call_sites():
    """Pin every load_table(spread=True) call site by module and COUNT —
    so a new spread call site cannot dodge the invariance check silently
    (adding one anywhere, including an already-covered module, fails here
    until SPREAD_QUERIES demonstrably exercises it)."""
    import pathlib

    import columbiaimagesearch_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    actual = {}
    for p in root.rglob("*.py"):
        rel = p.relative_to(root).as_posix()
        if rel == "sources/tables.py":  # the definition itself
            continue
        n = p.read_text().count("spread=True")
        if n:
            actual[rel] = n
    assert actual == EXPECTED_SPREAD_SITES, (
        f"spread=True call sites changed: {actual} != "
        f"{EXPECTED_SPREAD_SITES}. Update EXPECTED_SPREAD_SITES only after "
        "adding a SPREAD_QUERIES entry exercising the new site."
    )

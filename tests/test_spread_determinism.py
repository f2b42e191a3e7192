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
    "llm_pii_scrub",
    "text_repetition_stats",
    "text_boilerplate_ngrams",
    "text_quality_score",
    "text_langid",
    "emb_lsh_near_dup_pairs",
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


def test_covers_all_spread_call_sites():
    """Every operator module using load_table(spread=True) must have at
    least one registered query in SPREAD_QUERIES — so a new spread call
    site cannot dodge the invariance check silently."""
    import pathlib

    import columbiaimagesearch_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    spread_modules = {
        p.relative_to(root).as_posix()
        for p in root.rglob("*.py")
        if "spread=True" in p.read_text()
    }
    spread_modules.discard("sources/tables.py")  # the definition itself
    covered = {
        "operators/dedup.py",
        "operators/hygiene.py",
        "operators/textstats.py",
        "operators/similarity.py",
        "lopq/queries.py",
    }
    assert spread_modules <= covered, (
        f"spread call sites in {spread_modules - covered} lack coverage in "
        "SPREAD_QUERIES — add a query exercising them"
    )

"""Smoke test of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib.util
from pathlib import Path


def _load_entry_module():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_and_is_stable(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["qid", "rank", "id", "adc_dist", "exact_dist"]
    # deterministic: rerun yields identical results
    again = mod.entry(spark).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_contract_shapes(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name

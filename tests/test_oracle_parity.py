"""Local mirror of the driver's DuckDB-oracle correctness gate (t2).

Every registered QuerySpec must hash-match its oracle at sf0.001 (fast tier;
the driver runs sf0.01 — run the larger tier locally with
``SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``).
"""

from __future__ import annotations

import os

import pytest

from columbiaimagesearch_spark import registry
from columbiaimagesearch_spark.plans.parity import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

SPECS = registry.all_specs()


@pytest.fixture(scope="module")
def duck():
    return duckdb_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(name, spark, duck):
    result = compare(spark, SPECS[name], SF_DIR, duck)
    assert result.ok, f"{name}: {result.detail}"


def test_every_query_has_coverage_doc():
    for name, spec in SPECS.items():
        assert spec.doc, f"{name} missing doc"
        assert spec.survey_ops, f"{name} missing SURVEY §2 operator mapping"

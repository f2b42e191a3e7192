"""Round-start guard: assert the *physical* parquet types the queries assume.

The driver regenerates /root/testdata between rounds and has changed physical
types before (round 2: events.ts nanos -> micros broke 6 queries).  This test
fails fast and loudly if the on-disk schema drifts again, instead of letting
46 downstream queries mis-hash.

Pure pyarrow — no SparkSession needed, so it runs first and cheap.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")

# table -> {column: physical arrow type string}.  Only the columns whose
# physical type a query depends on (timestamps, list element types, key widths).
EXPECTED = {
    "lineitem": {
        "l_orderkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_shipdate": "timestamp[us]",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_orderdate": "timestamp[us]",
        "o_totalprice": "double",
    },
    "customer": {"c_custkey": "int64", "c_nationkey": "int32"},
    "supplier": {"s_suppkey": "int64", "s_nationkey": "int32"},
    "nation": {"n_nationkey": "int32", "n_regionkey": "int32"},
    "region": {"r_regionkey": "int32"},
    "part": {"p_partkey": "int64", "p_size": "int32"},
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",  # round-2 breakage point: must stay micros
        "user_id": "int64",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_physical_schema(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    schema = pq.read_schema(path)
    got = {name: str(schema.field(name).type) for name in schema.names}
    for col, want in EXPECTED[table].items():
        assert col in got, f"{table}.{col} missing from {path}"
        assert got[col] == want, (
            f"{table}.{col} physical type drifted: expected {want}, found "
            f"{got[col]} — the driver regenerated testdata with a new layout; "
            f"audit every query touching {table}.{col} before trusting hashes"
        )

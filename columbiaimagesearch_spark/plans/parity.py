"""Local mirror of the driver's DuckDB-oracle correctness gate.

For each registered QuerySpec with an oracle: run the Spark builder and the
DuckDB SQL on the same parquet tables, then compare row count, column names,
and (order-insensitively) values — exact for non-floats, atol=1e-6 for
floats (queries round their float outputs, so any drift beyond that is a
real parity bug to fix *before* the driver sees it).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from ..registry import QuerySpec
from ..sources import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-6
    return a == b


def compare(
    spark: SparkSession, spec: QuerySpec, sf_dir: str, con: duckdb.DuckDBPyConnection
) -> ParityResult:
    try:
        sdf = spec.builder(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return ParityResult(spec.name, False, f"spark error: {type(e).__name__}: {e}")
    if spec.oracle is None:
        return ParityResult(spec.name, True, "rows-only (no oracle)", len(sdf), -1)
    try:
        odf = con.execute(spec.oracle_for(sf_dir)).fetchdf()
    except Exception as e:  # noqa: BLE001
        return ParityResult(spec.name, False, f"oracle error: {type(e).__name__}: {e}")

    if sorted(sdf.columns) != sorted(odf.columns):
        return ParityResult(
            spec.name,
            False,
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
            len(sdf),
            len(odf),
        )
    if len(sdf) != len(odf):
        return ParityResult(
            spec.name, False, f"row count {len(sdf)} != {len(odf)}", len(sdf), len(odf)
        )
    s, o = _normalize(sdf), _normalize(odf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not _values_equal(x, y):
                return ParityResult(
                    spec.name,
                    False,
                    f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}",
                    len(sdf),
                    len(odf),
                )
    return ParityResult(spec.name, True, "match", len(sdf), len(odf))

"""F8 dynamic-column compatibility layer — the MapType escape hatch.

The reference stores extractions as *dynamic* HBase cells named
``ext:<extr_type>`` with companion cells suffixed ``_updateid`` /
``_processed`` / ``_failed``, and selects "the extraction itself" by key
pattern: startswith ``ext:<extr_type>`` AND NOT endswith a companion suffix
(``hbase_indexer_minimal.py:806-816``). The engine's normalized ``features``
schema (SURVEY §1.3) makes that a plain column filter — this module keeps
the promised ``MapType(STRING, BINARY-like)`` escape hatch for round-trip
compatibility with dynamic-cell data: build the cell map, select cells with
``F.map_filter`` (JVM-side higher-order function — no Python in the path),
and explode back to normalized rows.

At 100 TB this stays scan-shaped: map construction + map_filter + explode
are all per-row narrow transforms (no shuffle); the selector prunes
companion cells before the explode so only matching cells generate rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

EXTR_TYPE = "sbpycaffe_feat_full_image"
_COMPANION_SUFFIXES = ("_updateid", "_processed", "_failed")


def select_extraction_cells(
    cells: Column, extr_type: str, suffixes: tuple[str, ...] = _COMPANION_SUFFIXES
) -> Column:
    """The F8 selector over a MapType column: keep cells whose key starts
    with ``ext:<extr_type>`` and is not a companion cell (reference key
    test, hbase_indexer_minimal.py:806-816), as one ``map_filter`` HOF."""
    prefix = f"ext:{extr_type}"

    def keep(k: Column, v: Column) -> Column:
        cond = k.startswith(prefix)
        for s in suffixes:
            cond = cond & ~k.endswith(s)
        return cond

    return F.map_filter(cells, keep)


@register(
    "f8_dynamic_cells",
    survey_ops=("F8",),
    doc="Dynamic-cell compat round-trip: documents -> MapType cell map "
    "(ext:<type> value + _updateid/_processed companions + an info: cell, "
    "null-valued entries dropped by map_filter) -> F8 key-pattern selector "
    "(startswith ext:<type>, NOT endswith companion suffix; "
    "hbase_indexer_minimal.py:806-816) -> explode back to the normalized "
    "(doc_id, cell_key, cell_value) rows. All JVM higher-order functions, "
    "no shuffle.",
    oracle=f"""
WITH cells AS (
  SELECT doc_id, 'ext:{EXTR_TYPE}' AS cell_key, md5(text) AS cell_value
  FROM documents
  UNION ALL
  SELECT doc_id, 'ext:{EXTR_TYPE}_updateid',
         'index_update_' || CAST(doc_id % 100 AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT doc_id, 'ext:{EXTR_TYPE}_processed', '1'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'info:s3_url', 'https://img.host/' || CAST(doc_id AS VARCHAR)
  FROM documents
)
SELECT doc_id, cell_key, cell_value FROM cells
WHERE starts_with(cell_key, 'ext:{EXTR_TYPE}')
  AND NOT ends_with(cell_key, '_updateid')
  AND NOT ends_with(cell_key, '_processed')
  AND NOT ends_with(cell_key, '_failed')
""",
)
def f8_dynamic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.map_from_arrays(
        F.array(
            F.lit(f"ext:{EXTR_TYPE}"),
            F.lit(f"ext:{EXTR_TYPE}_updateid"),
            F.lit(f"ext:{EXTR_TYPE}_processed"),
            F.lit("info:s3_url"),
        ),
        F.array(
            F.md5(F.col("text").cast("binary")),
            F.concat(F.lit("index_update_"), (F.col("doc_id") % 100).cast("string")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("1")),
            F.concat(F.lit("https://img.host/"), F.col("doc_id").cast("string")),
        ),
    )
    # dynamic map = drop absent (null-valued) cells, mirroring sparse HBase rows
    cells = F.map_filter(raw, lambda k, v: v.isNotNull())
    selected = select_extraction_cells(cells, EXTR_TYPE)
    return (
        docs.select("doc_id", F.explode(selected).alias("cell_key", "cell_value"))
        .select("doc_id", "cell_key", "cell_value")
    )

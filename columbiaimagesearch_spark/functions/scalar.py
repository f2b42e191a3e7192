"""Scalar function library — SURVEY §2.7 C1-C10 as reusable Column builders.

Everything here is a composition of JVM built-ins (codegen-friendly, no
Python in the hot path). Citations point at the reference's hand-rolled
equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C1 — content identity: SHA1 of bytes, uppercased (imgio/imgio.py:23-39).
def sha1_upper(col: Column) -> Column:
    return F.upper(F.sha1(col.cast("binary")))


# C2 — base64 round trip (featsio.py:4-11; imgio.py:153-180).
def b64_encode(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def b64_decode(col: Column) -> Column:
    return F.unbase64(col)


# C5 — bbox <-> string pack/unpack (detector/utils.py:62-77,114-124:
# "<left>_<top>_<right>_<bottom>" embedded in the extraction column name).
def bbox_pack(left: Column, top: Column, right: Column, bottom: Column) -> Column:
    return F.concat_ws(
        "_",
        left.cast("string"),
        top.cast("string"),
        right.cast("string"),
        bottom.cast("string"),
    )


def bbox_unpack(col: Column) -> Column:
    parts = F.split(col, "_")
    return F.struct(
        parts.getItem(0).cast("int").alias("left"),
        parts.getItem(1).cast("int").alias("top"),
        parts.getItem(2).cast("int").alias("right"),
        parts.getItem(3).cast("int").alias("bottom"),
    )


# C6 — update_id grammar: index_update_<extr_type>_<YYYY-MM-DD>_<seq zfill 3>
# (hbase_indexer_minimal.py:595-617; extraction_checker.py:199-223).
def mint_update_id(extr_type: Column, date: Column, seq: Column) -> Column:
    return F.concat(
        F.lit("index_update_"),
        extr_type,
        F.lit("_"),
        F.date_format(date, "yyyy-MM-dd"),
        F.lit("_"),
        F.lpad(seq.cast("string"), 3, "0"),
    )


def parse_update_id(col: Column) -> Column:
    """update_id -> struct(extr_type, date, seq). Inverse of mint_update_id."""
    stripped = F.regexp_replace(col, "^index_update_", "")
    # date is the second-to-last _-separated token, seq the last
    seq = F.substring_index(stripped, "_", -1)
    date = F.substring_index(F.substring_index(stripped, "_", -2), "_", 1)
    extr = F.regexp_replace(stripped, "_[0-9]{4}-[0-9]{2}-[0-9]{2}_[0-9]+$", "")
    return F.struct(
        extr.alias("extr_type"),
        F.to_date(date, "yyyy-MM-dd").alias("date"),
        seq.cast("int").alias("seq"),
    )


# C6 — resume-cursor successor key: the reference appends '~' (0x7E, sorts
# after alphanumerics) to resume scans strictly after a key
# (hbase_indexer_minimal.py:388-413).
def successor_key(col: Column) -> Column:
    return F.concat(col, F.lit("~"))


# C7 — cell id <-> coarse pair (lopq model.py:706-710).
def cell_from_coarse(c1: Column, c2: Column, V: int) -> Column:
    return c1 * V + c2


def coarse_from_cell(cell: Column, V: int) -> Column:
    return F.struct(
        F.floor(cell / V).cast("int").alias("c1"), (cell % V).cast("int").alias("c2")
    )

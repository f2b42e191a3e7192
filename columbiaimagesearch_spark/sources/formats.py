"""Legacy/interchange format sources: TSV features (S12) and xvecs (S14).

S12 — the reference's Spark-era TSV feature format
``sha1\turl\tpath\tleft\ttop\tright\tbottom\tfeat...`` (read path
``featurizer/featsio.py:57-124``, exercised by
``tests/test_read_feats_tsv.py:1-13``): rebuilt as a schema'd
``spark.read.csv(sep='\t')`` scan + array assembly — splittable, pushdown-
capable, no Python in the row path.

S14 — the SIFT1M ``.fvecs``/``.ivecs`` benchmark format
(``lopq/lopq/utils.py:64-131``): each record is ``int32 dim`` followed by
``dim`` little-endian values. Rebuilt over ``binaryFile`` + one
``mapInPandas`` struct-unpack pass (bench-only ingestion; files are
per-task units, vectors stream out as Arrow batches).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feats_tsv_schema(dim: int) -> T.StructType:
    fields = [
        T.StructField("sha1", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("img_path", T.StringType()),
        T.StructField("left", T.IntegerType()),
        T.StructField("top", T.IntegerType()),
        T.StructField("right", T.IntegerType()),
        T.StructField("bottom", T.IntegerType()),
    ]
    fields += [T.StructField(f"f{i}", T.DoubleType()) for i in range(dim)]
    return T.StructType(fields)


def read_feats_tsv(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """TSV feature rows -> (sha1, url, img_path, bbox struct, feature array).

    The per-column read keeps the scan splittable and lets Catalyst prune
    unneeded feature columns; the final select assembles the engine's
    normalized schema (SURVEY §1.3 features table)."""
    raw = spark.read.csv(path, sep="\t", schema=feats_tsv_schema(dim), header=False)
    return raw.select(
        F.upper("sha1").alias("sha1"),
        "url",
        "img_path",
        F.struct("left", "top", "right", "bottom").alias("bbox"),
        F.array(*[F.col(f"f{i}") for i in range(dim)]).cast("array<float>").alias(
            "feature"
        ),
    )


def write_feats_tsv(df: DataFrame, path: str, dim: int) -> None:
    """Inverse of read_feats_tsv for round-trip tests / legacy export."""
    cols = [
        F.col("sha1"),
        F.col("url"),
        F.col("img_path"),
        F.col("bbox.left"),
        F.col("bbox.top"),
        F.col("bbox.right"),
        F.col("bbox.bottom"),
    ] + [F.col("feature").getItem(i).cast("double") for i in range(dim)]
    df.select(cols).write.mode("overwrite").csv(path, sep="\t")


_XVEC_KIND = {"fvecs": ("f", 4, "array<float>"), "ivecs": ("i", 4, "array<int>")}


def read_xvecs(spark: SparkSession, path: str, kind: str = "fvecs") -> DataFrame:
    """(file, row_id, vec) from .fvecs/.ivecs files (SIFT1M layout)."""
    fmt, width, arr_type = _XVEC_KIND[kind]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, blob in zip(pdf["path"], pdf["content"]):
                out, off, row = [], 0, 0
                n = len(blob)
                while off + 4 <= n:
                    (dim,) = struct.unpack_from("<i", blob, off)
                    off += 4
                    vec = np.frombuffer(blob, dtype=f"<{fmt}4", count=dim, offset=off)
                    off += dim * width
                    out.append((path_, row, vec.tolist()))
                    row += 1
                yield pd.DataFrame(out, columns=["file", "row_id", "vec"])

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(parse, f"file string, row_id bigint, vec {arr_type}")
    )


def write_xvecs(vectors: np.ndarray, path: str, kind: str = "fvecs") -> None:
    """Local-file writer (driver-side, bench fixture generation only)."""
    fmt, _, _ = _XVEC_KIND[kind]
    with open(path, "wb") as fh:
        for vec in vectors:
            fh.write(struct.pack("<i", len(vec)))
            fh.write(np.asarray(vec, dtype=f"<{fmt}4").tobytes())

"""Distributed LOPQ encoding: features DataFrame -> codes DataFrame.

Replaces the reference's multiprocessing encode drivers
(``lopq/lopq/utils.py:134-218 compute_codes_parallel`` and the RDD
text-file round trip ``search.py:227-273``) with a single ``mapInPandas``
stage: the model rides a broadcast variable, each Arrow batch is encoded
with vectorized numpy, and the output is a columnar codes table

    (id BIGINT, c1 INT, c2 INT, cell INT, fine ARRAY<INT>)

Scale notes: this is the LAST stage that touches raw vectors — everything
downstream (index build, search probe) shuffles only ids + codes (a few
bytes/row vs KBs for the vector). At 100 TB the codes table is written
partitioned/bucketed by ``cell`` so the search-time semi-join prunes file
groups (SURVEY §4 "cell pruning" as a physical layout decision).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .model import LOPQModel

CODES_SCHEMA = "id bigint, c1 int, c2 int, cell int, fine array<int>"


def encode_dataframe(
    spark: SparkSession,
    df: DataFrame,
    model: LOPQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every row of ``df`` to LOPQ codes (one mapInPandas pass)."""
    b_model = spark.sparkContext.broadcast(model.to_arrays())

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = LOPQModel.from_arrays(b_model.value)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            coarse, fine = model.encode(X)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "c1": coarse[:, 0].astype(np.int32),
                    "c2": coarse[:, 1].astype(np.int32),
                    "cell": model.cell_id(coarse).astype(np.int32),
                    "fine": list(fine.astype(np.int32)),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(encode_batches, CODES_SCHEMA)

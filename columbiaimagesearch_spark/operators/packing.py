"""LLM-training-data layout operators: deterministic splits and sequence
packing over the ``documents`` table.

These extend the text/dedup surface (SURVEY §7.0) with the two layout steps
a training pipeline runs after filtering/dedup: carving reproducible
train/val/test splits, and packing variable-length documents into
fixed-token-budget sequences.

Both are deterministic functions of document *content keys*, never of
partitioning or row order, so a 100 TB rescan (or a backfill on different
cluster geometry) reproduces byte-identical assignments:

- ``llm_split_assign``: split + per-language stratified sampling by
  independent salted md5 buckets — one narrow codegen'd pass, zero
  shuffles, the rates dim is a broadcast join.
- ``llm_seq_pack``: greedy first-fit-in-order packing inside hash shards.
  Packing is inherently sequential *within* a shard (each bin depends on
  the previous docs), so the shard is the parallelism unit: shards hash
  over doc_id, each packs independently in one ``applyInPandas`` group
  with O(1) carry state, and the budget B bounds bin size. At 100 TB the
  shard count scales with the cluster (shuffle carries (shard, doc_id,
  n_tokens) ints only — never text).

Neither is registered with the driver (the registry is sized to the
driver's 50-entry CORRECTNESS window, all slots holding SURVEY §2
operators); ``tests/test_packing.py`` runs the SAME DuckDB parity harness
on them locally — the split op against a plain SQL oracle, the packing op
against a recursive-CTE twin of the greedy recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

# split thresholds over a 0..999 bucket space: 80/10/10
TRAIN_UPTO = 800
VAL_UPTO = 900
# per-language stratified keep rates (permille) — en-heavy corpora get
# downsampled tails, the classic rebalancing step before training
LANG_RATE_PERMILLE = {"en": 1000, "de": 600, "fr": 600, "es": 300}
DEFAULT_RATE_PERMILLE = 150

PACK_BUDGET = 512  # tokens per packed sequence
PACK_SHARDS = 8


def _md5_bucket(col, salt: str, mod: int):
    """Deterministic 0..mod-1 bucket from the top 60 bits of a salted md5 —
    the same cross-engine idiom as dedup.hashed_shingle_sets (DuckDB twin:
    CAST('0x' || substr(md5(...),1,15) AS BIGINT) % mod)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % mod).cast("bigint")


SPLIT_ORACLE_SQL = f"""
WITH bucketed AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % 1000 AS split_bucket,
         CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % 1000 AS sample_bucket
  FROM documents
)
SELECT b.doc_id, b.lang, b.split_bucket, b.sample_bucket,
       CASE WHEN b.split_bucket < {TRAIN_UPTO} THEN 'train'
            WHEN b.split_bucket < {VAL_UPTO} THEN 'val'
            ELSE 'test' END AS split,
       b.sample_bucket < COALESCE(r.rate_permille, {DEFAULT_RATE_PERMILLE}) AS keep
FROM bucketed b
LEFT JOIN (VALUES {", ".join(f"('{k}', {v})" for k, v in LANG_RATE_PERMILLE.items())})
  AS r(lang, rate_permille) ON b.lang = r.lang
"""


def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, split, keep): reproducible train/val/test split plus
    per-language stratified downsampling. Two INDEPENDENT salted hash
    buckets (split vs sample) so sampling never biases split membership.
    Narrow plan: one pass, rates dim broadcast, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [(k, v) for k, v in LANG_RATE_PERMILLE.items()], "lang string, rate_permille int"
    )
    b = docs.select(
        "doc_id",
        "lang",
        _md5_bucket(F.col("doc_id"), "split:", 1000).alias("split_bucket"),
        _md5_bucket(F.col("doc_id"), "sample:", 1000).alias("sample_bucket"),
    )
    return (
        b.join(F.broadcast(rates), "lang", "left")
        .select(
            "doc_id",
            "lang",
            "split_bucket",
            "sample_bucket",
            F.when(F.col("split_bucket") < TRAIN_UPTO, F.lit("train"))
            .when(F.col("split_bucket") < VAL_UPTO, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
            (
                F.col("sample_bucket")
                < F.coalesce(F.col("rate_permille"), F.lit(DEFAULT_RATE_PERMILLE))
            ).alias("keep"),
        )
    )


PACK_ORACLE_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % {PACK_SHARDS} AS shard,
         doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (
           PARTITION BY CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             % {PACK_SHARDS}
           ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens <= {PACK_BUDGET} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + o.n_tokens <= {PACK_BUDGET} THEN p.fill + o.n_tokens
              ELSE o.n_tokens END
  FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT shard, bin, doc_id, n_tokens FROM pack
"""


def llm_seq_pack(
    spark: SparkSession,
    sf_dir: str,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """(shard, bin, doc_id, n_tokens): greedy first-fit-in-order sequence
    packing — docs ordered by doc_id within a hash shard; a doc joins the
    current bin unless that would exceed ``budget``, else opens the next.
    An oversized doc (n_tokens > budget) always gets a bin to itself.

    The per-shard scan is the one genuinely sequential step, so it runs as
    one ``applyInPandas`` group per shard with O(1) carry — the shard
    count, not the corpus, is the parallelism knob."""
    docs = load_table(spark, sf_dir, "documents").select(
        _md5_bucket(F.col("doc_id"), "shard:", shards).alias("shard"),
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        cur, fill = 0, 0
        for i, t in enumerate(pdf["n_tokens"]):
            t = int(t)
            if i > 0 and fill + t > budget:
                cur, fill = cur + 1, t
            else:
                fill += t
            bins.append(cur)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["shard", "bin", "doc_id", "n_tokens"]]

    return docs.groupBy("shard").applyInPandas(
        pack, "shard bigint, bin bigint, doc_id bigint, n_tokens bigint"
    )

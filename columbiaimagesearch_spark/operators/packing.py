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

All three (split, pack, mixture) are registered driver-visible since
round 3; ``tests/test_packing.py`` runs the SAME DuckDB parity harness
locally — the split op against a plain SQL oracle, the packing op against
a recursive-CTE twin of the greedy recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
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


@register(
    "llm_split_assign",
    survey_ops=("LLM-split", "F2"),
    # Folded r10 (driver-green r3-r9) in exchange for llm_split_leakage
    # entering at birth: the leakage oracle embeds this exact split-bucket
    # SQL, so the split function keeps a hash-checked driver row
    # transitively; F2 green via f_predicate_bundle. Still in local
    # parity + bench.
    driver=False,
    doc="Reproducible train/val/test split + per-language stratified "
    "downsampling by two INDEPENDENT salted md5 buckets — a deterministic "
    "function of content keys, never of partitioning, so a 100 TB rescan "
    "reproduces byte-identical assignments. One narrow codegen'd pass; "
    "rates dim broadcast; zero shuffles.",
    oracle=SPLIT_ORACLE_SQL,
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable rendering of :func:`split_assign_from` over the
    ``documents`` table."""
    return split_assign_from(load_table(spark, sf_dir, "documents"))


def split_assign_from(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, split, keep): reproducible train/val/test split plus
    per-language stratified downsampling, over any (doc_id, lang) relation.
    Two INDEPENDENT salted hash buckets (split vs sample) so sampling never
    biases split membership. Narrow plan: one pass, rates dim broadcast,
    no shuffle."""
    rates = docs.sparkSession.createDataFrame(
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
  FROM documents WHERE text IS NOT NULL
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


@register(
    "llm_seq_pack",
    survey_ops=("LLM-pack", "ST1"),
    doc=f"Greedy first-fit-in-order sequence packing into {PACK_BUDGET}-token "
    f"bins inside {PACK_SHARDS} hash shards: the per-shard scan is the one "
    "genuinely sequential step, so it runs as one applyInPandas group per "
    "shard with O(1) carry — shard count, not corpus size, is the "
    "parallelism knob; the shuffle carries (shard, doc_id, n_tokens) ints "
    "only, never text. Oracle: recursive-CTE twin of the greedy recurrence.",
    oracle=PACK_ORACLE_SQL,
)
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
    return seq_pack_from(load_table(spark, sf_dir, "documents"), budget, shards)


def seq_pack_from(
    docs: DataFrame, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> DataFrame:
    """DataFrame-level sequence packing over any (doc_id, text) relation —
    see :func:`llm_seq_pack`.

    NULL ``text`` rows are dropped up front (review r13): size(split(
    NULL)) is NULL, which reaches the pack kernel as NaN and crashed the
    whole shard task on ``int(t)`` with an opaque executor traceback. A
    null-text doc has no tokens to pack; the recursive-CTE oracle
    filters the same rows so both sides agree."""
    docs = docs.where(F.col("text").isNotNull()).select(
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


# Domain mixing: temperature-scaled per-source sampling (the PaLM/Llama
# "alpha-weighted mixture" step). weight_s = n_s^alpha / sum_t n_t^alpha
# upweights rare sources relative to their natural share; the keep rate
# converts the weight into a deterministic per-doc decision under a total
# token/doc budget.
MIX_ALPHA = 0.5
MIX_BUDGET_FRAC = 0.5  # target corpus size as a fraction of the input

MIXTURE_ORACLE_SQL = f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS source_docs
  FROM documents GROUP BY source
),
weights AS (
  SELECT source, source_docs,
         ROUND(POW(source_docs, {MIX_ALPHA})
               / SUM(POW(source_docs, {MIX_ALPHA})) OVER () + 1e-12, 4) AS weight,
         SUM(source_docs) OVER () AS total_docs
  FROM counts
),
rates AS (
  SELECT source, source_docs, weight,
         CAST(FLOOR(LEAST(1.0,
             {MIX_BUDGET_FRAC} * total_docs * weight / source_docs)
           * 1000 + 1e-9) AS BIGINT) AS rate_permille
  FROM weights
)
SELECT d.doc_id, d.source, r.source_docs, r.weight, r.rate_permille,
       CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         % 1000 < r.rate_permille AS keep
FROM documents d JOIN rates r ON d.source IS NOT DISTINCT FROM r.source
"""


@register(
    "llm_mixture_sample",
    survey_ops=("LLM-mixture", "A2"),
    doc=f"Temperature-scaled domain mixture (alpha={MIX_ALPHA}): source "
    "share ∝ source_docs^alpha (upweights rare domains), realized as a "
    "deterministic salted-hash keep decision. One partial-agg "
    "groupBy(source) builds the S-row dim; window totals run over those S "
    "rows only; the dim broadcasts back — corpus-side decision is a "
    "narrow codegen'd pass.",
    oracle=MIXTURE_ORACLE_SQL,
)
def llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, source_docs, weight, rate_permille, keep):
    temperature-scaled domain mixture — each source's share of the output
    is proportional to ``source_docs ** MIX_ALPHA`` (alpha < 1 upweights
    rare domains), realized as a deterministic salted-hash keep decision
    against a permille rate, capped at 1000 (a source is never
    oversampled past its full size; replication is a separate layout
    concern).

    Plan: one partial-agg groupBy(source) builds the S-row dim; the
    window totals run over those S rows only; the dim broadcasts back and
    the corpus-side keep decision is a narrow codegen'd pass. The rate is
    derived from the 4dp-ROUNDED weight with a +1e-9 floor guard so both
    engines compute identical permilles (same cross-engine float idiom as
    the registered specs)."""
    return mixture_sample_from(
        load_table(spark, sf_dir, "documents").select("doc_id", "source")
    )


def mixture_sample_from(docs: DataFrame) -> DataFrame:
    """DataFrame-level mixture sampling over any (doc_id, source) relation
    — see :func:`llm_mixture_sample`.

    NULL ``source`` is its own cohort (review r13): the groupBy already
    emits a NULL-group rate row, but the old inner equi-join silently
    dropped every NULL-source doc (NULL != NULL in join keys) — no keep
    verdict at all, so downstream joins lost them. The null-safe join
    matches the NULL cohort to its own rate row; the DuckDB oracle uses
    IS NOT DISTINCT FROM for the same semantics."""
    from pyspark.sql import Window

    counts = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("source_docs")
    )
    w = Window.partitionBy()
    pow_docs = F.pow(F.col("source_docs"), F.lit(MIX_ALPHA))
    rates = (
        counts.withColumn(
            "weight", F.round(pow_docs / F.sum(pow_docs).over(w) + F.lit(1e-12), 4)
        )
        .withColumn("total_docs", F.sum("source_docs").over(w))
        .withColumn(
            "rate_permille",
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.lit(MIX_BUDGET_FRAC)
                    * F.col("total_docs")
                    * F.col("weight")
                    / F.col("source_docs"),
                )
                * 1000
                + F.lit(1e-9)
            ).cast("bigint"),
        )
        .drop("total_docs")
    )
    r = F.broadcast(rates.withColumnRenamed("source", "_src"))
    return (
        docs.join(r, F.col("source").eqNullSafe(F.col("_src")))
        .select(
            "doc_id",
            "source",
            "source_docs",
            "weight",
            "rate_permille",
            (
                _md5_bucket(F.col("doc_id"), "mix:", 1000)
                < F.col("rate_permille")
            ).alias("keep"),
        )
    )

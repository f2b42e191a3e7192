"""Deduplication operator family over the ``documents`` table.

The reference dedups at three levels: exact-id set dedup
(``updater/extraction_checker.py:312-316``), index-add (cell,id) dedup
(``lopq/lopq/search.py:340-364``), and near-duplicate *search results* via a
distance threshold (``searcher/generic_searcher.py:43-45``). For a 100 TB
training-data pipeline we generalize that to the standard content-dedup
ladder: exact hash -> n-gram Jaccard -> MinHash+LSH -> SimHash (embedding
cosine near-dup lives in ``similarity.py``).

Scale design: every variant is expressed so the *pairwise* work only happens
inside small candidate buckets (LSH bands / hash groups), never as a global
cross join; the cross-join variant (``dedup_ngram_jaccard_pairs``) is the
small-N oracle baseline for validating the LSH path. Hash/band computation is
all JVM built-ins (md5 / transform / aggregate); shuffles carry
(bucket_key, doc_id) pairs — bytes, not documents.

Cross-engine determinism trick: MinHash uses ``min(md5(seed || ':' ||
shingle))`` per seed — md5 is identical in Spark and DuckDB, so the oracle
reproduces signatures exactly (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# LSH tuning: threshold ~ (1/b)^(1/r). r=3, b=8 puts the S-curve midpoint at
# (1/8)^(1/3) = 0.5 — exactly the verify threshold — while keeping background
# pairs (Jaccard ~0.08 on this corpus) out of the candidate set:
# P(band collision) = j^r, so background pairs collide at ~5e-4/band vs ~0.125
# for true near-dups. At 5k docs that's ~10^4 candidates, not ~10^6.
N_MINHASH = 24
N_BANDS = 8
BAND_ROWS = N_MINHASH // N_BANDS  # r = 3
JACCARD_THRESHOLD = 0.5
NGRAM_PAIR_THRESHOLD = 0.2


_SHINGLES_EXPR = """
array_distinct(transform(
  sequence(1, size(split(text, ' ')) - 1),
  i -> concat_ws(' ', element_at(split(text, ' '), i),
                 element_at(split(text, ' '), i + 1))))
"""


def _shingles(_col=None):
    """Distinct word-bigram shingles of the ``text`` column (array<string>)."""
    return F.expr(_SHINGLES_EXPR)


_SHINGLES_SQL = """
list_distinct([string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
               for i in generate_series(1, len(string_split(text, ' ')) - 1)])
"""


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _shingles(F.col("text")).alias("shingles"))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    survey_ops=("A8", "DEDUP-exact"),
    doc="Exact content dedup: hash-groupBy on md5(text); canonical = min "
    "doc_id per group (keep-first policy), dup_count per group.",
    oracle="""
SELECT md5(text) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (brute-force pairwise — the oracle baseline for LSH)
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard_pairs",
    survey_ops=("DEDUP-ngram", "F9"),
    doc="n-gram Jaccard near-dup pairs (brute-force): distinct word-bigram "
    "sets, all pairs i<j, Jaccard >= 0.2. The small-N ground truth that "
    "validates the MinHash-LSH scale path.",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= {NGRAM_PAIR_THRESHOLD}
""",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingled_docs(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .where(jac >= NGRAM_PAIR_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path: shingle -> minhash -> band -> bucket-join)
# ---------------------------------------------------------------------------


def minhash_band_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_key) rows: md5-minhash signatures banded for LSH.

    Deliberately explode-based rather than nested array HOFs: Catalyst's
    project-collapse inlines a shingle expression into every one of the
    N_MINHASH lambda bodies (24x recompute), whereas this form computes each
    (doc, shingle, seed) hash exactly once, whole-stage-codegen'd, and
    shuffles only (doc_id, seed, min_hash) — the formulation that survives
    100 TB (the oracle SQL keeps the list-comprehension form; results are
    identical).
    """
    flat = shingled_docs(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    hashed = flat.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("seed"),
        "s",
    ).select(
        "doc_id",
        "seed",
        F.md5(
            F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s")).cast("binary")
        ).alias("h"),
    )
    minh = hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("mh"))
    return (
        minh.withColumn("band", F.floor(F.col("seed") / BAND_ROWS))
        .groupBy("doc_id", "band")
        .agg(
            F.concat(
                F.col("band").cast("string"),
                F.lit("|"),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s.getField("mh"),
                    ),
                ),
            ).alias("band_key")
        )
        .select("doc_id", "band_key")
    )


_SIG_SQL = f"""
[list_aggregate(list_transform(shingles,
                               s -> md5(CAST(i AS VARCHAR) || ':' || s)), 'min')
 for i in generate_series(0, {N_MINHASH - 1})]
"""


@register(
    "dedup_minhash_lsh_pairs",
    survey_ops=("DEDUP-minhash", "J7", "A8"),
    doc=f"MinHash+LSH near-dup pairs: {N_MINHASH} md5-minhashes, {N_BANDS} "
    f"bands x {BAND_ROWS} rows; candidates = docs sharing any band bucket; "
    f"verified with exact shingle Jaccard >= {JACCARD_THRESHOLD}. Only "
    "bucket collisions are ever paired — the 100 TB-safe dedup plan.",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
),
sigs AS (
  SELECT doc_id, shingles, {_SIG_SQL} AS sig FROM sh
),
bands AS (
  SELECT doc_id,
         unnest([CAST(b AS VARCHAR) || '|' || sig[3 * b + 1] || sig[3 * b + 2]
                   || sig[3 * b + 3]
                 for b in generate_series(0, {N_BANDS - 1})]) AS band_key
  FROM sigs
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) AS inter,
         CAST(len(x.shingles) + len(y.shingles) AS DOUBLE) AS sz
  FROM cands c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, ROUND(inter / (sz - inter), 4) AS jaccard
FROM verified
WHERE inter / (sz - inter) >= {JACCARD_THRESHOLD}
""",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = minhash_band_keys(spark, sf_dir)
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = shingled_docs(spark, sf_dir)
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cands.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double").alias("inter"),
            (F.size("sh_a") + F.size("sh_b")).cast("double").alias("sz"),
        )
    )
    jac = F.col("inter") / (F.col("sz") - F.col("inter"))
    return verified.where(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (60-bit, md5-portable)
# ---------------------------------------------------------------------------


@register(
    "dedup_simhash",
    survey_ops=("DEDUP-simhash",),
    doc="SimHash document signatures: 60-bit (15 hex chars of md5 per token "
    "so Spark's conv() and DuckDB's 0x-cast agree), majority vote per bit "
    "over tokens, emitted as a bit string (portable across engines).",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS hv FROM tok
),
bits AS (
  SELECT doc_id, g.i,
         CASE WHEN SUM(((hv >> g.i) & 1) * 2 - 1) > 0 THEN '1' ELSE '0' END AS b
  FROM h, (SELECT unnest(generate_series(0, 59)) AS i) g
  GROUP BY doc_id, g.i
)
SELECT doc_id, string_agg(b, '' ORDER BY i DESC) AS simhash_bits
FROM bits GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    h = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("t").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    bits = (
        h.select("doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("i"))
        .select("doc_id", "i", F.expr("(shiftright(hv, i) & 1) * 2 - 1").alias("delta"))
        .groupBy("doc_id", "i")
        .agg(
            F.when(F.sum("delta") > 0, F.lit("1")).otherwise(F.lit("0")).alias("b")
        )
    )
    # assemble MSB-first bit string
    return (
        bits.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.reverse(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "b"))),
                        lambda s: s.getField("b"),
                    )
                ),
            ).alias("simhash_bits")
        )
    )

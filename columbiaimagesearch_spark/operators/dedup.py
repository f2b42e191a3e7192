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

Cross-engine determinism trick: each shingle is hashed ONCE with md5
(identical in Spark and DuckDB; top 60 bits as a bigint), then the
N_MINHASH "permutations" are universal hashes ``(a_i*h + b_i) mod P``
(P = 2^31-1; products stay under 2^62, no overflow in either engine) — so
the oracle reproduces signatures exactly while the expensive digest runs
once per shingle, not once per (shingle, seed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# Block sizing for the exact-Jaccard block-pair matmul: every doc replicates
# to B tasks, task (a, b) handles its two blocks' pairs in one matmul.
# B derives from the doc count (derive_jaccard_blocks) so per-task memory
# (n/B x local_vocab float32) stays bounded as the corpus grows; past
# JACCARD_MAX_DOCS the operator refuses outright — exact all-pairs is the
# small-N ground-truth rung, dedup_minhash_lsh_pairs is the scale path.
JACCARD_TARGET_BLOCK_DOCS = 320  # ~320 docs/block ≈ the benched r5 shape
JACCARD_MAX_DOCS = 100_000


def derive_jaccard_blocks(
    n_docs: int,
    target_block_docs: int = JACCARD_TARGET_BLOCK_DOCS,
    max_docs: int = JACCARD_MAX_DOCS,
) -> int:
    """Block count sized to the corpus (VERDICT r5 next-round #4): per
    block-pair task the kernel holds ~2 x target_block_docs rows and their
    factorized shingle vocabulary. Raises past ``max_docs``: at 100k docs
    the all-pairs count (5e9) stops being a ground-truth rung — use
    ``dedup_minhash_lsh_pairs`` (banded candidates + exact verify), which
    computes the same verified-Jaccard pairs without the quadratic."""
    if n_docs > max_docs:
        raise ValueError(
            f"dedup_ngram_jaccard_pairs is the exact small-N oracle rung "
            f"({n_docs} docs > {max_docs} cap): the all-pairs matmul would "
            "do O(n^2) work. Use dedup_minhash_lsh_pairs — the banded scale "
            "path with the same exact-Jaccard verification."
        )
    import math

    return max(1, math.ceil(n_docs / max(1, target_block_docs)))

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

# Universal-hash permutation family for MinHash: h_i(x) = (A[i]*x + B[i]) % P.
MERSENNE_P = 2147483647  # 2^31 - 1
MH_A = [(2654435761 * (i + 1)) % MERSENNE_P for i in range(N_MINHASH)]
MH_B = [(40503 * (i + 7)) % MERSENNE_P for i in range(N_MINHASH)]


_SHINGLES_SQL = """
list_distinct([string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
               for i in generate_series(1, len(string_split(text, ' ')) - 1)])
"""


# SQL forms of the shingle pipeline (r17, guide §7.3 driver-side latency):
# one selectExpr parses a whole expression tree in ONE py4j round trip,
# where the equivalent pyspark.sql.functions chain paid one round trip per
# Column node — measured 83 ms -> ~10 ms per shingles_from build. The
# parsed trees are the SAME Catalyst nodes, so the physical plan (and the
# Generate-materialization property below) is unchanged (plan-pinned).
_WS_EXPR = "explode(array(split(text, ' '))) AS ws"
_SHINGLE_EXPR = (
    "array_distinct(transform(slice(ws, 1, greatest(size(ws) - 1, 0)), "
    "(w, i) -> concat(w, ' ', element_at(ws, i + 2))))"
)


def shingles_from(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles) from any (doc_id, text, ...) relation: distinct
    word-bigram shingles per document.

    The token array is materialized through a ``Generate`` node (explode of a
    one-element array): a plain ``split(...).alias("ws")`` projection gets
    inlined by Catalyst's project-collapse into every HOF lambda element
    downstream — i.e. the full split re-runs per shingle, O(tokens^2) per
    doc. Generate output is a real attribute, so the split runs once per doc
    and the shingle lambda only does element_at lookups.
    """
    return docs.selectExpr("doc_id", _WS_EXPR).selectExpr(
        "doc_id", f"{_SHINGLE_EXPR} AS shingles"
    )


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles) of the documents table — see :func:`shingles_from`."""
    return shingles_from(load_table(spark, sf_dir, "documents", spread=True))


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
    # Folded r14 after its fresh r13 green row (rotation discipline; slot
    # goes to j3_anti_join_dedup, folded r11). DEDUP-ngram remains
    # driver-covered via dedup_minhash_lsh_pairs (MinHash over the SAME
    # word-bigram shingle sets), F9 multiply covered.
    driver=False,
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
    # Exact all-pairs, but NOT the per-pair broadcast nested-loop form: that
    # evaluated array_intersect once per (i, j) in codegen — ~36 us/pair,
    # 452 s for sf0.1's 12.5M pairs (r5 second-tier bench caught it). An
    # inverted-index join is WORSE on this corpus (tiny shingle vocabulary,
    # heavy sharing: 36M candidate pairs > 12.5M all-pairs). Instead: the
    # block-PAIR matmul idiom (emb_near_dup_pairs's batching applied to an
    # unblocked corpus) — docs replicate to B tasks each, task (a, b)
    # factorizes its local shingle vocabulary and computes ALL intersection
    # counts of its two blocks as ONE 0/1 float32 matmul (set sizes are the
    # row sums; Jaccard = i / (|A|+|B|-i)). Same 12.5M-pair work at BLAS
    # speed: 452 s -> ~2 s at sf0.1. Every pair lands in exactly one task
    # (same-block pairs in (p, p), cross in (min, max)).
    #
    # Scale shape: this stays the SMALL-N ground-truth rung of the ladder
    # (MinHash-LSH is the scale path) — O(n^2/B) work per task, per-task
    # memory = n_task x local_vocab floats, shuffle = B copies of the
    # shingle sets. B derives from the doc count (bounded tasks at any
    # corpus size); past JACCARD_MAX_DOCS the derivation raises, naming
    # dedup_minhash_lsh_pairs as the scale path.
    sh = shingled_docs(spark, sf_dir)
    # plan-time count on the base table: parquet row-count metadata, no
    # shingle computation
    B = derive_jaccard_blocks(load_table(spark, sf_dir, "documents").count())
    replicas = F.broadcast(
        spark.range(B).select(F.col("id").cast("int").alias("oblk"))
    )
    tagged = (
        sh.withColumn("blk", F.pmod(F.col("doc_id"), B).cast("int"))
        .crossJoin(replicas)
        .select(
            F.least("blk", "oblk").alias("ba"),
            F.greatest("blk", "oblk").alias("bb"),
            "doc_id",
            "blk",
            "shingles",
        )
    )

    def block_pair_jaccard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        if not len(pdf):
            return empty
        ba, bb = int(key[0]), int(key[1])
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ids = pdf["doc_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        sh_lists = [list(s) if s is not None else [] for s in pdf["shingles"]]
        lens = np.fromiter((len(s) for s in sh_lists), dtype=np.int64,
                           count=len(sh_lists))
        if lens.sum() == 0:
            return empty
        flat = np.concatenate(
            [np.asarray(s, dtype=object) for s in sh_lists if s]
        )
        codes, _uniq = pd.factorize(flat)
        M = np.zeros((len(pdf), codes.max() + 1), dtype=np.float32)
        M[np.repeat(np.arange(len(pdf)), lens), codes] = 1.0
        inter = M @ M.T
        if ba == bb:
            ia, ib = np.triu_indices(len(pdf), k=1)
        else:
            sel_a = np.flatnonzero(blks == ba)
            sel_b = np.flatnonzero(blks == bb)
            ia = np.repeat(sel_a, len(sel_b))
            ib = np.tile(sel_b, len(sel_a))
        i = inter[ia, ib].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = i / (lens[ia] + lens[ib] - i)
        keep = jac >= NGRAM_PAIR_THRESHOLD  # NaN (0/0) compares False
        ia, ib, jac = ia[keep], ib[keep], jac[keep]
        a_ids, b_ids = ids[ia], ids[ib]
        return pd.DataFrame(
            {
                "doc_a": np.minimum(a_ids, b_ids),
                "doc_b": np.maximum(a_ids, b_ids),
                "jaccard": jac,
            }
        )

    pairs = tagged.groupBy("ba", "bb").applyInPandas(
        block_pair_jaccard, "doc_a bigint, doc_b bigint, jaccard double"
    )
    # round Spark-side (HALF_UP BigDecimal semantics — matches the DuckDB
    # oracle's ROUND; np.round is half-even and would eventually mismatch)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path: shingle -> minhash -> band -> bucket-join)
# ---------------------------------------------------------------------------


_A_ARR = ",".join(str(a) for a in MH_A)
_B_ARR = ",".join(str(b) for b in MH_B)

# sig[i] = min over shingle-hashes h of (A[i]*h + B[i]) % P. The inner
# transform runs over ``hs`` — a *materialized aggregation output*, not a
# projection alias — so Catalyst's project-collapse cannot inline the md5
# work into the 24 lambda bodies (each digest runs exactly once upstream).
_SIG_EXPR = (
    f"transform(sequence(0, {N_MINHASH - 1}), i -> array_min(transform(hs, "
    f"h -> (element_at(array({_A_ARR}), i + 1) * h "
    f"+ element_at(array({_B_ARR}), i + 1)) % {MERSENNE_P})))"
)

_BAND_EXPR = (
    f"transform(sequence(0, {N_BANDS - 1}), b -> concat_ws('-', "
    + ", ".join(
        ["cast(b as string)"]
        + [f"element_at(sig, {BAND_ROWS} * b + {r + 1})" for r in range(BAND_ROWS)]
    )
    + "))"
)


def hashed_from(docs: DataFrame, persist: bool = True) -> DataFrame:
    """(doc_id, hs) from any (doc_id, text, ...) relation: the doc's
    distinct shingle set as 31-bit hashes.

    One md5 per (doc, shingle) — top 60 bits as bigint, reduced mod P. All
    downstream minhash/LSH/verify math runs on these int sets: signatures
    are permutations of hs, and the verify Jaccard intersects hs directly
    (identical arithmetic in the DuckDB oracle; a mod-2^31 collision would
    have to occur within one doc's ~50 shingles to shift a value, and would
    shift it identically in both engines). Persisted: the LSH query's
    self-join + verify reference this branch four times, and Spark's cache
    manager dedupes by canonicalized plan — at scale this is the
    'write the shingle-hash table once' step, shuffling hashes, not text.
    """
    out = (
        shingles_from(docs)
        .selectExpr("doc_id", "explode(shingles) AS s")
        .selectExpr(
            "doc_id",
            "CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 15), 16, 10) "
            f"AS BIGINT) % {MERSENNE_P} AS h",
        )
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    return out.persist() if persist else out


def hashed_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs) of the documents table — see :func:`hashed_from`."""
    return hashed_from(load_table(spark, sf_dir, "documents", spread=True))


def bands_from(hashed: DataFrame) -> DataFrame:
    """(doc_id, band_key) rows from a (doc_id, hs) relation: minhash
    signatures banded for LSH. The N_MINHASH permutations are pure int
    arithmetic over the per-doc hash array; band keys concatenate
    BAND_ROWS signature slots."""
    return hashed.selectExpr("doc_id", f"{_SIG_EXPR} AS sig").selectExpr(
        "doc_id", f"explode({_BAND_EXPR}) AS band_key"
    )


def minhash_band_keys(
    spark: SparkSession, sf_dir: str, hashed: DataFrame | None = None
) -> DataFrame:
    """(doc_id, band_key) of the documents table — see :func:`bands_from`."""
    if hashed is None:
        hashed = hashed_shingle_sets(spark, sf_dir)
    return bands_from(hashed)


_HS_SQL = (
    f"list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) "
    f"% {MERSENNE_P})"
)

_SIG_SQL = f"""
[list_aggregate(list_transform(hs, h -> (([{_A_ARR}])[i + 1] * h
                                         + ([{_B_ARR}])[i + 1]) % {MERSENNE_P}),
                'min')
 for i in generate_series(0, {N_MINHASH - 1})]
"""


# Base CTE chain from raw documents to the banded signature table — shared
# by the pair query's oracle, the connected-components oracle, and the
# fuzzy-decontamination oracle (hygiene.py), which append their own
# candidate/verify tails.
BASE_MINHASH_CTES_SQL = f"""sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
),
hh AS (
  SELECT doc_id, list_distinct({_HS_SQL}) AS hs FROM sh
),
sigs AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM hh
),
bands AS (
  SELECT doc_id,
         unnest([CAST(b AS VARCHAR) || '-'
                   || CAST(sig[{BAND_ROWS} * b + 1] AS VARCHAR) || '-'
                   || CAST(sig[{BAND_ROWS} * b + 2] AS VARCHAR) || '-'
                   || CAST(sig[{BAND_ROWS} * b + 3] AS VARCHAR)
                 for b in generate_series(0, {N_BANDS - 1})]) AS band_key
  FROM sigs
)
"""

_PAIRS_CTES_SQL = f"""{BASE_MINHASH_CTES_SQL},
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS inter,
         CAST(len(x.hs) + len(y.hs) AS DOUBLE) AS sz
  FROM cands c
  JOIN hh x ON x.doc_id = c.doc_a
  JOIN hh y ON y.doc_id = c.doc_b
)
"""


def verified_jaccard_pairs(cands: DataFrame, hashed: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate (doc_a, doc_b) pairs
    against a (doc_id, hs) lookup — the shared verify stage of the batch
    LSH query and the incremental streaming dedup."""
    x = hashed.selectExpr("doc_id AS doc_a", "hs AS hs_a")
    y = hashed.selectExpr("doc_id AS doc_b", "hs AS hs_b")
    verified = cands.join(x, "doc_a").join(y, "doc_b").selectExpr(
        "doc_a",
        "doc_b",
        "CAST(size(array_intersect(hs_a, hs_b)) AS DOUBLE) AS inter",
        "CAST(size(hs_a) + size(hs_b) AS DOUBLE) AS sz",
    )
    jac = F.col("inter") / (F.col("sz") - F.col("inter"))
    return verified.where(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


@register(
    "dedup_minhash_lsh_pairs",
    # DEDUP-ngram (r6): this spec minhashes the same distinct word-bigram
    # shingle sets as dedup_ngram_jaccard_pairs and verifies candidates with
    # the EXACT shingle Jaccard — it is the n-gram Jaccard operator's scale
    # form, so it carries the tag while the brute-force rung is folded.
    survey_ops=("DEDUP-minhash", "DEDUP-ngram", "J7", "A8"),
    doc=f"MinHash+LSH near-dup pairs: one md5 per shingle + {N_MINHASH} "
    f"universal-hash permutations, {N_BANDS} bands x {BAND_ROWS} rows; "
    f"candidates = docs sharing any band bucket; verified with exact shingle "
    f"Jaccard >= {JACCARD_THRESHOLD}. Only bucket collisions are ever "
    "paired — the 100 TB-safe dedup plan.",
    oracle=f"""
WITH {_PAIRS_CTES_SQL}
SELECT doc_a, doc_b, ROUND(inter / (sz - inter), 4) AS jaccard
FROM verified
WHERE inter / (sz - inter) >= {JACCARD_THRESHOLD}
""",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return near_dup_pairs_from(docs)


# Same refusal philosophy as similarity.LSH_MAX_BUCKET: a band bucket of b
# docs emits ~b^2/2 candidate pairs through the self-join, and IDENTICAL
# texts share EVERY band key, so an exact-duplicate flood turns one bucket
# quadratic no matter the banding. The linear fix is the exact-hash
# pre-rung (dedup_exact_groups); the guard names it instead of running it.
MINHASH_MAX_BUCKET = 4096


def near_dup_pairs_from(
    docs: DataFrame,
    hashed: DataFrame | None = None,
    max_bucket: int | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """DataFrame-level MinHash+LSH near-dup pairs over any (doc_id, text)
    relation — the library entry point behind ``dedup_minhash_lsh_pairs``
    (and the per-batch stage of streaming/dedup_stream.py).

    The shingle-hash relation is persisted (four references in the pair
    plan).  A caller that materializes the pairs eagerly (e.g.
    ``curate.curate_docs``, whose ``connected_components`` checkpoints
    them) should build ``hashed_from(docs)`` itself, pass it in, and
    unpersist it afterwards — otherwise each invocation parks one cached
    relation until LRU eviction.

    ``max_bucket`` (opt-in; :data:`MINHASH_MAX_BUCKET` is the suggested
    cap) runs one eager aggregation over the band table and REFUSES if any
    band bucket exceeds it — an exact-duplicate flood makes one bucket
    quadratic in the candidate self-join whatever the banding (identical
    texts share every band key). Default None keeps the registered lazy
    query plan job-free. An eager caller that enables it should ALSO pass
    ``bands`` as a relation it persists/unpersists itself (the hashed
    contract): the guard's aggregation then doubles as the band table's
    materialization and the self-join reads the cache, so the check costs
    ~nothing — without it the guard re-runs the 24-permutation signature
    pass (measured +0.8 s of a 5.5 s curate call at sf0.1)."""
    if hashed is None:
        hashed = hashed_from(docs)
    if bands is None:
        bands = bands_from(hashed)
    if max_bucket is not None:
        top = (
            bands.groupBy("band_key")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        if top is not None and top > max_bucket:
            raise RuntimeError(
                f"near_dup_pairs_from: a band bucket holds {top} docs "
                f"> max_bucket={max_bucket}; the candidate self-join would "
                "emit ~b^2/2 pairs for that bucket. The corpus has a mass "
                "of (near-)identical texts — run the linear exact-hash "
                "rung first (dedup_exact_groups: md5 groupBy, keep the "
                "min-doc_id canonical) and re-run on its survivors, or "
                "pass a larger max_bucket (None disables) if the "
                "quadratic cost is intended."
            )
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return verified_jaccard_pairs(cands, hashed)


# ---------------------------------------------------------------------------
# Connected components: pairs -> canonical cluster per doc
# ---------------------------------------------------------------------------


def _union_find_components(edges) -> dict[int, int]:
    """Driver-side union-find with path compression over any iterable of
    (int, int) edges (a lazy iterator keeps peak memory at the Arrow
    buffers + the O(nodes) parent dict); labels resolve to the MIN doc_id
    per component — identical semantics to the distributed min-label
    propagation."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, r), x)
    return {x: comp_min[find(x)] for x in parent}


# Edge-count bound for the driver fast path: 2M (doc_a, doc_b) longs is
# ~32 MB collected — trivial on any driver, and union-find over it runs in
# well under a second. The distributed loop's per-round Spark jobs cost
# seconds of pure scheduling even on a 500-node graph, so the fast path is
# a ~10x wall win on every real near-dup graph below the bound.
COMPONENTS_DRIVER_MAX_EDGES = 2_000_000


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 20,
    driver_max_edges: int = COMPONENTS_DRIVER_MAX_EDGES,
) -> DataFrame:
    """(doc_id, component): min-doc_id label propagation to fixpoint.

    The canonicalization step after pair generation: every doc gets the
    smallest doc_id reachable through the near-dup graph (singletons map to
    themselves). Two physical strategies with IDENTICAL semantics:

    - **small graph** (≤ ``driver_max_edges`` pairs — checked with one
      bounded count after the pairs materialize): collect the edge list
      and run driver-side union-find. The near-dup graph is orders of
      magnitude smaller than the corpus, so this is the common case, and
      it replaces seconds of per-round job scheduling with milliseconds.
    - **large graph**: iterative distributed min-label propagation — each
      round propagates labels one hop; near-dup clusters have tiny
      diameters, so convergence is a few rounds regardless of corpus
      size. Per-round shuffle carries (edge endpoints, label) only.

    Only nodes that appear in an edge enter either strategy — the
    singleton majority joins back as identity labels in one final union.

    Lineage is truncated per round with ``localCheckpoint`` (see inline
    comment); on a cluster where executor loss matters, swap it for
    ``checkpoint()`` with a checkpoint dir — same semantics, fault-tolerant
    at the cost of an HDFS round-trip per iteration."""
    # Materialize pairs ONCE before anything fans out over them: the edge
    # union references `pairs` in two branches and Spark does not share
    # subplans across union arms, so a lazy pairs input (the full LSH
    # verify) would execute twice just to build edges. Checkpointing also
    # keeps every propagation round's scan against cached rows.
    pairs = pairs.localCheckpoint(eager=True)
    # Bounded fetch doubling as the bounded count: limit(N+1) caps the
    # Arrow collect at N+1 rows, and its length IS the fast-path test — one
    # job where the old count()-then-collect shape paid two. toPandas
    # lands the two int64 columns as numpy buffers (~16 B/edge -> ~32 MB at
    # the 2M default bound; Row objects would cost 100+ B/edge).
    edge_pdf = (
        pairs.select("doc_a", "doc_b").limit(driver_max_edges + 1).toPandas()
    )
    if len(edge_pdf) <= driver_max_edges:
        labels_map = _union_find_components(
            zip(
                map(int, edge_pdf["doc_a"].to_numpy()),
                map(int, edge_pdf["doc_b"].to_numpy()),
            )
        )
        spark = pairs.sparkSession
        if not labels_map:
            return nodes.select(
                "doc_id", F.col("doc_id").alias("component")
            )
        labels = spark.createDataFrame(
            list(labels_map.items()), "doc_id long, component long"
        )
        # singleton completion as ONE broadcast left join (labels is
        # bounded by 2x the edge cap, always broadcastable here) — the
        # previous anti-join + union shape ran two branches and a union
        # through the caller's eager checkpoint, ~1 s of pure job
        # scheduling on a tiny graph (r5 curation-chain profile)
        return nodes.select("doc_id").join(
            F.broadcast(labels.withColumnRenamed("doc_id", "_lbl_id")),
            F.col("doc_id") == F.col("_lbl_id"),
            "left",
        ).select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    ).persist()
    # in_graph feeds the singleton anti-join, which downstream callers
    # evaluate AFTER this function returns — by then edges is unpersisted,
    # so without an eager checkpoint every consumer would re-run the whole
    # pair-generation lineage (the LSH verify) once per action. The id set
    # is tiny (docs with >= 1 near-dup edge); pin it.
    in_graph = (
        edges.select(F.col("src").alias("doc_id")).distinct().localCheckpoint(eager=True)
    )
    singletons = nodes.select("doc_id").join(in_graph, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("component")
    )
    labels = (
        nodes.select("doc_id")
        .join(in_graph, "doc_id", "left_semi")
        .select(F.col("doc_id"), F.col("doc_id").alias("component"))
        .persist()
    )
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("component").alias("neighbor_min"))
        )
        # localCheckpoint (eager) TRUNCATES LINEAGE each round — `labels`
        # feeds both the propagation join and the carry-forward, so without
        # truncation the logical plan doubles per iteration and a
        # diameter-d graph builds a 2^d-node tree (the JVM OOMs just
        # *stringifying* it past d≈15; persist caches data but keeps the
        # plan). Checkpointing makes every round's plan O(1), which is what
        # lets a long-chain graph converge at all.
        new_labels = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("neighbor_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # A near-dup chain with diameter > max_iter would return split
        # clusters SILENTLY (duplicate docs surviving dedup) — plausible
        # after transitive LSH merges at corpus scale. Warn loudly; the
        # caller should re-run with a larger max_iter (each extra round is
        # one |graph|-row join, so doubling it is cheap).
        import warnings

        # NB: `changed` is bound only when the loop body ran; max_iter<=0
        # reaches this else-branch with zero rounds executed
        warnings.warn(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds "
            f"({changed if max_iter > 0 else 'all'} labels still changing): "
            "components may be split — re-run with a larger max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    edges.unpersist()
    return labels.unionByName(singletons)


@register(
    "dedup_components",
    survey_ops=("DEDUP-components", "A8", "J7"),
    # Folded r10 (driver-green r1-r9) in exchange for dedup_cluster_stats
    # entering at birth: DEDUP-components/A8 green there (same CC pipeline
    # — a labeling error changes those hashes too), J7 via
    # j7_incremental_add_anti. Still local-parity-checked + in bench.
    driver=False,
    doc="Near-dup canonicalization: connected components over the verified "
    "MinHash-LSH pair graph via iterative min-label propagation (few rounds "
    "— cluster diameters are tiny); every doc maps to the smallest doc_id "
    "in its cluster, singletons to themselves. Oracle: recursive-CTE "
    "transitive closure over the same pairs.",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTES_SQL},
pairs AS (
  SELECT doc_a, doc_b FROM verified
  WHERE inter / (sz - inter) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
cc AS (
  SELECT doc_id AS doc, doc_id AS root FROM documents
  UNION
  SELECT e.dst AS doc, cc.root
  FROM cc JOIN edges e ON e.src = cc.doc
)
SELECT doc AS doc_id, CAST(MIN(root) AS BIGINT) AS component,
       CAST(COUNT(*) OVER (PARTITION BY MIN(root)) AS BIGINT) AS cluster_size
FROM cc GROUP BY doc
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(docs, pairs)
    w_size = F.count(F.lit(1)).over(Window.partitionBy("component"))
    return labels.select(
        "doc_id", "component", w_size.cast("bigint").alias("cluster_size")
    )


@register(
    "dedup_cluster_stats",
    survey_ops=("DEDUP-components", "A8", "A2"),
    # NEW r10, driver-visible at birth (the r8/r9 lesson: new operators
    # enter the window immediately); dedup_components folded in exchange —
    # DEDUP-components stays covered here, J7 via j7_incremental_add_anti,
    # and any labeling error changes these per-cluster hashes, so the CC
    # machinery keeps a hash-checked driver row through this spec.
    # Folded r12 after TWO held driver-green rows (r10+r11) in exchange
    # for s_format_roundtrips entering at birth: DEDUP-components stays
    # driver-covered on llm_embedding_dedup (the same component-labeling
    # machinery, NEW r12), A8 on 7+ rows, A2 on a2_cell_histogram. Still
    # local-parity-checked + in bench.
    driver=False,
    doc="Per-cluster dedup savings report: for every near-dup cluster of "
    "2+ docs (connected components over the verified MinHash-LSH pair "
    "graph), its size, total text chars, and the chars dedup saves by "
    "keeping only the min-doc_id representative — the artifact a corpus "
    "owner reads to see what near-dup dedup buys before running it. "
    "Reference analogue: the update/index cardinality counters "
    "(cufacesearch full_image_updates_stats) rendered at corpus-curation "
    "grain. Scale: the pair graph is band-key-joined ints (never "
    "all-pairs), label propagation is a handful of int-only rounds, and "
    "the final agg is a partial+final hash agg on (component) — nothing "
    "here widens with text size except the one length() scan.",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTES_SQL},
pairs AS (
  SELECT doc_a, doc_b FROM verified
  WHERE inter / (sz - inter) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
cc AS (
  SELECT doc_id AS doc, doc_id AS root FROM documents
  UNION
  SELECT e.dst AS doc, cc.root
  FROM cc JOIN edges e ON e.src = cc.doc
),
lab AS (
  SELECT doc, MIN(root) AS component FROM cc GROUP BY doc
)
SELECT CAST(l.component AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(d.text))
            - MAX(CASE WHEN d.doc_id = l.component
                       THEN length(d.text) END) AS BIGINT) AS dup_chars
FROM lab l JOIN documents d ON d.doc_id = l.doc
GROUP BY l.component
HAVING COUNT(*) >= 2
""",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(docs.select("doc_id"), pairs)
    return cluster_stats_from(docs, labels)


def validate_keep_policy(
    keep: str | tuple[str, str], docs: DataFrame | None
):
    """Validate a representative keep policy EAGERLY (callable before any
    corpus-sized work — ``curate_docs`` runs it at entry so a typo'd
    policy or missing score column fails at the call, not hours into the
    chain) and return the score Column for the scored policies (None for
    ``"min_id"``). Raises ValueError with the same contracts
    :func:`dedup_losers_from` documents."""
    if keep == "min_id":
        return None
    if keep == "longest":
        needed = "text"
    elif (
        isinstance(keep, tuple)
        and len(keep) == 2
        and keep[0] == "score"
        and isinstance(keep[1], str)
    ):
        needed = keep[1]
    else:
        raise ValueError(
            f"unknown keep policy {keep!r}: expected 'min_id', 'longest', "
            "or ('score', <column>)"
        )
    if docs is None:
        raise ValueError(
            f"keep policy {keep!r} needs the docs relation to score "
            "representatives; pass docs or use keep='min_id'"
        )
    if needed not in docs.columns:
        raise ValueError(
            f"keep policy {keep!r} needs docs column {needed!r}; docs has "
            f"{docs.columns}"
        )
    if keep == "longest":
        return F.length("text").cast("double")
    return F.col(needed).cast("double")


def dedup_losers_from(
    labels: DataFrame,
    docs: DataFrame | None = None,
    keep: str | tuple[str, str] = "min_id",
) -> DataFrame:
    """(doc_id) rows a dedup rung DROPS under the representative keep
    policy (VERDICT r12 next-round #4) — shared by the lexical and the
    embedding rung of ``curate_docs``. ``labels`` is a
    (doc_id, component) relation (:func:`connected_components` output).

    Policies:

    - ``"min_id"`` (default — the oracle/driver form): keep each
      cluster's min doc_id. The component label IS that id, so this path
      is the plain inequality filter with no extra join or agg.
    - ``"longest"``: keep the member with the most text characters;
      needs ``docs`` with (doc_id, text). What real curation pipelines
      usually want — SemDeDup keeps the lowest-loss member, the
      reference's near-dup filter keeps the query side
      (generic_searcher.py:43-45).
    - ``("score", col)``: keep the member with the LARGEST ``docs[col]``
      (a quality score, a loss negated, ...).

    Determinism: ties break toward the SMALLEST doc_id — the winner is
    ``min(struct(-score, doc_id))`` per component — so ``"min_id"`` is
    exactly the scored policy with a constant score, and the same corpus
    picks the same representatives on any cluster geometry. A NULL score
    (null text, null score column) is coalesced to -inf: Spark's struct
    min would otherwise sort the NULL FIRST and silently crown the
    unscored member, the inverse of any sane policy — with the coalesce
    it loses to every scored member and an all-null cluster falls back
    to min doc_id. Scores must be NaN-free (Spark orders NaN above every
    double, so a NaN row would LOSE every tie yet never error — coalesce
    upstream). A labeled member with NO ``docs`` row at all is unscored:
    it can neither win a representative slot nor be dropped (the rep
    join is inner), so pass the SAME relation the labeling was built
    from — ``curate_docs`` does, by construction.

    Plan shape (the 100 TB contract): the score is projected map-side
    (``length(text)`` / the score column over ``docs``), so only
    (doc_id, component, score) ints/doubles cross the ONE extra hash
    agg + rep join this policy adds — text never shuffles, exactly like
    the min_id path."""
    if keep == "min_id":
        return labels.where(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )
    score = validate_keep_policy(keep, docs)
    # NULL never wins (see docstring): struct min sorts null first
    scored = docs.select(
        "doc_id",
        F.coalesce(score, F.lit(float("-inf"))).alias("_keep_score"),
    )
    reps = (
        labels.join(scored, "doc_id")
        .groupBy("component")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_keep_score")).alias("neg_score"),
                    F.col("doc_id").alias("rep_id"),
                )
            ).alias("r")
        )
        .select("component", F.col("r.rep_id").alias("rep_id"))
    )
    return (
        labels.join(reps, "component")
        .where(F.col("doc_id") != F.col("rep_id"))
        .select("doc_id")
    )


def cluster_stats_from(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Library form over any (doc_id, text) relation plus a
    (doc_id, component) labeling (e.g. :func:`connected_components`
    output): per >=2-doc cluster, its member count / total chars / chars
    dedup saves by keeping only the min-doc_id representative. ONE
    length() projection is the only thing that touches text; the label
    join and the partial/final hash agg move ints only (plan-asserted in
    tests/test_plans.py)."""
    d = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )
    return (
        labels.join(d, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (
                F.sum("n_chars")
                - F.max(
                    F.when(
                        F.col("doc_id") == F.col("component"),
                        F.col("n_chars"),
                    )
                )
            )
            .cast("bigint")
            .alias("dup_chars"),
        )
        .where(F.col("n_docs") >= 2)
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
    # MAP-ONLY (r4): a simhash is a per-document property, so the 60
    # majority votes are computed inside one Arrow batch and the stage
    # pipelines out of the scan with ZERO shuffle — 0.7 s vs 1.7-2.3 s for
    # the previous explode + 60-SUM groupBy at sf0.1, and at 100 TB it
    # removes an exchange of one 8-byte hash PER TOKEN (comparable to
    # shuffling the text itself). hashlib.md5 of the UTF-8 token matches
    # Spark's md5(cast binary) and DuckDB's md5(VARCHAR) byte-for-byte, so
    # the oracle is unchanged (equality with the JVM form verified).
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def simhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(60)[None, :]
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = (text or "").split(" ")
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                        for t in toks
                    ],
                    dtype=np.int64,
                )
                votes = (2 * ((hs[:, None] >> shifts) & 1) - 1).sum(axis=0)
                out.append(
                    (
                        int(doc_id),
                        "".join("1" if v > 0 else "0" for v in votes[::-1]),
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "simhash_bits"])

    # NULL-text docs are dropped, matching the oracle (review r13): DuckDB's
    # unnest(string_split(NULL)) yields zero token rows so the doc is absent
    # from the oracle output, while the kernel's (text or '') fallback would
    # emit a signature row — a latent row-count divergence on any corpus
    # with nullable text (the fixture has none, so output is unchanged).
    docs = (
        load_table(spark, sf_dir, "documents", spread=True)
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return docs.mapInPandas(simhash, "doc_id bigint, simhash_bits string")


# ---------------------------------------------------------------------------
# Exact substring duplication (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" — exact-substring tier of the dedup ladder)
# ---------------------------------------------------------------------------

SUB_L = 6  # duplicated-span gram length (tokens)
DUP_COVER_FLAG = 0.30  # flag docs with > this fraction of tokens in dup spans


_SUB_GRAM_EXPR = f"""
transform(
  sequence(0, size(words) - {SUB_L}),
  i -> struct(
    i AS pos,
    CAST(conv(substring(md5(CAST(concat_ws(' ', slice(words, i + 1, {SUB_L}))
                                 AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS h))
"""

SUBSTRING_SPANS_ORACLE_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
tok AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens FROM w),
e AS (
  SELECT doc_id, generate_subscripts(words, 1) AS p, unnest(words) AS wd FROM w
),
l AS (
  SELECT doc_id, p, wd,
         {", ".join(f"lead(wd, {i}) OVER win AS w{i}" for i in range(1, SUB_L))}
  FROM e WINDOW win AS (PARTITION BY doc_id ORDER BY p)
),
g AS (
  SELECT doc_id, p - 1 AS pos,
         CAST('0x' || substr(md5(wd || ' ' ||
           {" || ' ' || ".join(f"w{i}" for i in range(1, SUB_L))}), 1, 15)
           AS BIGINT) AS h
  FROM l WHERE w{SUB_L - 1} IS NOT NULL
),
duph AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
starts AS (SELECT doc_id, pos FROM g JOIN duph USING (h)),
lagged AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM starts
),
cov AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_starts,
         CAST(SUM(LEAST({SUB_L}, pos - COALESCE(prev, pos - {SUB_L})))
              AS BIGINT) AS dup_cover_tokens
  FROM lagged GROUP BY doc_id
),
f AS (
  SELECT t.doc_id, t.n_tokens,
         CAST(COALESCE(c.n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
         CAST(COALESCE(c.dup_cover_tokens, 0) AS BIGINT) AS dup_cover_tokens,
         ROUND(CAST(COALESCE(c.dup_cover_tokens, 0) AS DOUBLE) / t.n_tokens
               + 1e-9, 4) AS dup_cover_frac
  FROM tok t LEFT JOIN cov c USING (doc_id)
)
SELECT *, dup_cover_frac > {DUP_COVER_FLAG} AS flagged FROM f
"""


@register(
    "dedup_substring_spans",
    survey_ops=("DEDUP-substring", "A8", "F9"),
    # Promoted into the driver window in round 4 (q1_pricing_summary folded
    # to make room): DEDUP-substring is a NEW capability tag and the
    # registry invariant requires every tag a driver-green carrier.
    doc=f"Exact-substring duplication stats (Lee et al. 2022 exact-substring "
    f"dedup, the tier between exact-hash and MinHash): every length-{SUB_L} "
    "token gram is hashed map-side (HOF over the words array — no window "
    "shuffle); grams occurring >= 2x corpus-wide (within- OR cross-doc) "
    "mark duplicated spans; per-doc coverage is the union length of the "
    "[pos, pos+L) intervals via one lag-window over the duplicated STARTS "
    "only (tiny vs the corpus), never an interval explode. Shuffles carry "
    "(doc_id, pos, h) ints; text never moves.",
    oracle=SUBSTRING_SPANS_ORACLE_SQL,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return substring_spans_from(docs)


def grams_from(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h) rolling-hash gram rows of a (doc_id, text) relation
    — the shared intermediate of :func:`substring_spans_from`, exposed so
    eager callers (curate) can own its cache lifetime."""
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    return (
        words.where(F.size("words") >= SUB_L)
        .select("doc_id", F.explode(F.expr(_SUB_GRAM_EXPR)).alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def substring_spans_from(
    docs: DataFrame, grams: DataFrame | None = None, persist: bool = True
) -> DataFrame:
    """(doc_id, n_tokens, n_dup_starts, dup_cover_tokens, dup_cover_frac,
    flagged) over any (doc_id, text) relation.

    Plan shape at 100 TB: gram hashing is a map-only projection out of the
    scan (array HOF at token granularity); the only corpus-sized shuffle
    keys (doc_id, pos, h) ints by h for the duplicate-count aggregation
    (AQE-skew-splittable join, not a window, so one hot gram cannot pin a
    partition); the coverage window runs over duplicated starts only —
    a tiny fraction of the corpus for clean data.

    The gram relation is referenced twice (dup-count agg build + join
    probe) and Spark shares no subplans, so without a cache the whole
    gram-hashing HOF pass runs twice (measured 1.9 -> 1.4 s at sf0.1);
    ``persist=True`` caches it, identical calls sharing one entry via plan
    canonicalization with LRU reclaim — the hashed_from contract. Callers
    that consume the result eagerly and repeatedly (curate) should pass a
    ``grams_from(docs)`` relation they persist/unpersist themselves, so no
    cache outlives the call."""
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    tok = words.select(
        "doc_id", F.size("words").cast("bigint").alias("n_tokens")
    )
    if grams is None:
        grams = grams_from(docs)
        if persist:
            grams = grams.persist()
    duph = grams.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(
        F.col("c") >= 2
    ).select("h")
    starts = grams.join(duph, "h").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    lagged = starts.withColumn("prev", F.lag("pos").over(wd))
    cov = lagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_starts"),
        F.sum(
            F.least(
                F.lit(SUB_L),
                F.col("pos") - F.coalesce(F.col("prev"), F.col("pos") - SUB_L),
            )
        ).alias("dup_cover_tokens"),
    )
    out = tok.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_starts", F.lit(0)).cast("bigint").alias("n_dup_starts"),
        F.coalesce("dup_cover_tokens", F.lit(0))
        .cast("bigint")
        .alias("dup_cover_tokens"),
        F.round(
            F.coalesce("dup_cover_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens")
            + F.lit(1e-9),
            4,
        ).alias("dup_cover_frac"),
    )
    return out.withColumn("flagged", F.col("dup_cover_frac") > DUP_COVER_FLAG)

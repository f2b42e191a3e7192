"""Text-analysis operators over the ``documents`` table.

Part of the LLM-training-data surface layered on the reference's
featurize-operator contract (SURVEY §7.0): language-ID, quality scoring,
token counting, and document fingerprinting — all JVM-side built-ins
(split / transform / aggregate / regexp), no Python UDFs in the hot path,
so they whole-stage-codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# Marker stopword sets for the language-ID heuristic (classic stopword-hit
# n-gram heuristic; on real corpora these dominate quickly).
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "de", "la", "y", "que"),
}


def _tok(col):
    return F.split(col, " ")


# The Gopher/C4-style quality gate thresholds — ONE definition shared by
# text_quality_score's passes_filter, corpus_report's pass_rate, and the
# curate_docs(quality_filter=True) stage, so the three surfaces cannot
# drift apart.
QUALITY_MIN_CHARS = 50
QUALITY_MAX_CHARS = 10_000
QUALITY_MIN_ALPHA = 0.5


def quality_gate():
    """Boolean Column: does the row's ``text`` pass the quality floor
    (length in [QUALITY_MIN_CHARS, QUALITY_MAX_CHARS], alpha ratio >
    QUALITY_MIN_ALPHA)? Codegen'd string expressions only — map-only,
    no shuffle, no Python."""
    n_chars = F.length("text")
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / n_chars
    )
    return n_chars.between(QUALITY_MIN_CHARS, QUALITY_MAX_CHARS) & (
        alpha_ratio > QUALITY_MIN_ALPHA
    )


def quality_verdicts_from(docs: DataFrame) -> DataFrame:
    """(doc_id, passes_filter) over any (doc_id, text) relation — the
    :func:`quality_gate` as a library verdict form, consumed by
    ``curate_docs(quality_filter=True)`` and equal by construction to
    ``text_quality_score``'s passes_filter column (pinned by test)."""
    return docs.select("doc_id", quality_gate().alias("passes_filter"))


@register(
    "text_token_stats",
    survey_ops=("TXT-tokens", "C6"),
    doc="Token counting: whitespace tokens + BPE-ish regex word/number/symbol "
    "pieces + char length; all codegen'd string ops.",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       n_chars AS n_chars_declared
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread: split+size is a cheap JVM expression; the spread shuffle
    # measured 1.16x slower than one-core evaluation
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tok(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("bigint")
        .alias("n_pieces"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_declared"),
    )


@register(
    "text_quality_score",
    survey_ops=("TXT-quality",),
    # Folded r14 after its fresh r13 green row (rotation discipline: fold
    # the freshest rows to free slots for the oldest folds — slot goes to
    # st1_count_batch_assembly). TXT-quality stays driver-green via
    # corpus_report; local parity still checks this spec every round.
    driver=False,
    doc="Quality scoring: length/space/alpha ratios and mean token length — "
    "the cheap heuristics used to pre-filter web text before training.",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       ROUND(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
             / length(text) + 1e-9, 4) AS space_ratio,
       ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / length(text) + 1e-9, 4) AS alpha_ratio,
       ROUND(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
             / len(string_split(text, ' ')) + 1e-9, 4) AS mean_token_len,
       (length(text) BETWEEN 50 AND 10000
        AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / length(text) > 0.5) AS passes_filter
FROM documents
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    n_chars = F.length("text")
    n_tokens = F.size(_tok(F.col("text")))
    n_spaces = F.length(F.regexp_replace("text", "[^ ]", ""))
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    alpha_ratio = n_alpha.cast("double") / n_chars
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(n_spaces.cast("double") / n_chars + F.lit(1e-9), 4).alias("space_ratio"),
        F.round(alpha_ratio + F.lit(1e-9), 4).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
            + F.lit(1e-9),
            4,
        ).alias("mean_token_len"),
        quality_gate().alias("passes_filter"),
    )


def _marker_count_sql(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({toks}))) AS BIGINT)"
    )


@register(
    "text_langid",
    survey_ops=("TXT-langid",),
    doc="Language-ID: stopword-marker n-gram heuristic + CJK charset check; "
    "argmax with deterministic tie-breaks, compared against the labeled lang.",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_marker_count_sql("en")} AS s_en,
         {_marker_count_sql("de")} AS s_de,
         {_marker_count_sql("fr")} AS s_fr,
         {_marker_count_sql("es")} AS s_es,
         CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) AS s_zh
  FROM documents
)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
       CASE WHEN s_zh > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM scored
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = _tok(F.col("text"))

    def marker_count(lang: str):
        markers = list(_LANG_MARKERS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("bigint")

    scored = docs.select(
        "doc_id",
        "lang",
        marker_count("en").alias("s_en"),
        marker_count("de").alias("s_de"),
        marker_count("fr").alias("s_fr"),
        marker_count("es").alias("s_es"),
        F.length(F.regexp_replace("text", "[^一-鿿]", ""))
        .cast("bigint")
        .alias("s_zh"),
    )
    best = F.greatest("s_en", "s_de", "s_fr", "s_es")
    pred = (
        F.when(F.col("s_zh") > 0, "zh")
        .when(best == 0, "und")
        .when(F.col("s_en") >= F.greatest("s_de", "s_fr", "s_es"), "en")
        .when(F.col("s_de") >= F.greatest("s_fr", "s_es"), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return scored.withColumn("pred_lang", pred)


# Karp-Rabin window fingerprint: base/modulus of the polynomial rolling
# hash (winnowing, Schleimer et al. SIGMOD'03 §2: min of window hashes is
# the document fingerprint). All-integer arithmetic — bitwise identical in
# any engine, unlike the md5-per-gram form this replaced (r2 bench: md5
# digests per character position made this the most expensive query).
_FP_WIN = 8
_FP_BASE = 257
_FP_MOD = 2_147_483_647  # 2^31 - 1
_FP_POWS = [pow(_FP_BASE, _FP_WIN - 1 - j, _FP_MOD) for j in range(_FP_WIN)]


def _fingerprint_oracle_sql(sf_dir: str) -> str:
    """Python twin of text_fingerprint: same integer window hashes (numpy
    int64 — products bounded by 2^21 codepoint x 2^31 modulus << 2^63) and
    the same md5-of-utf8 content hash, rendered as a VALUES literal."""
    import hashlib
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..lopq.twin import values_sql

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pows = np.array(_FP_POWS, dtype=np.int64)
    rows = []
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        md5h = hashlib.md5(text.encode("utf-8")).hexdigest()
        cs = np.array([ord(ch) for ch in text], dtype=np.int64)
        if len(cs) >= _FP_WIN:
            sw = np.lib.stride_tricks.sliding_window_view(cs, _FP_WIN)
            fp = int(((sw * pows).sum(axis=1) % _FP_MOD).min())
        else:
            fp = 0
            for c in cs.tolist():
                fp = (fp * _FP_BASE + c) % _FP_MOD
        rows.append((int(did), md5h, fp))
    return values_sql(
        rows,
        [("doc_id", "BIGINT"), ("content_md5", "VARCHAR"), ("window_fp", "BIGINT")],
    )


@register(
    "text_fingerprint",
    survey_ops=("TXT-fingerprint", "C1"),
    doc="Document fingerprinting: whole-doc content hash (the sha1-identity "
    "idiom of imgio.py:23-39, md5 for cross-engine parity) plus a "
    "winnowing-style fingerprint — the MIN of Karp-Rabin polynomial hashes "
    "over character 8-gram windows (Schleimer et al. winnowing). One "
    "Arrow-vectorized mapInPandas pass: per-char work in Spark's built-in "
    "HOFs is interpreted per element (measured: md5-per-gram 2.7 s ≈ "
    "integer-HOF 2.9 s at sf0.1 — lambda dispatch, not hashing, is the "
    "cost), while the numpy sliding-window dot does the same math "
    "vectorized. No shuffle; scales with input splits. Oracle: Python "
    "twin VALUES (identical integer arithmetic).",
    oracle=_fingerprint_oracle_sql,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import numpy as np
    import pandas as pd

    # NOT spread: the rolling hash is one numpy pass per batch, measured
    # shuffle-bound when spread (1.08x slower)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pows = _FP_POWS

    def fp_batches(batches):
        p = np.array(pows, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            md5s, fps = [], []
            for text in pdf["text"]:
                md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
                # utf-32-le frombuffer = vectorized ord(): one int64
                # codepoint per char, exactly the twin's arithmetic
                cs = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if len(cs) >= _FP_WIN:
                    sw = np.lib.stride_tricks.sliding_window_view(cs, _FP_WIN)
                    fps.append(int(((sw * p).sum(axis=1) % _FP_MOD).min()))
                else:
                    fp = 0
                    for c in cs.tolist():
                        fp = (fp * _FP_BASE + c) % _FP_MOD
                    fps.append(fp)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content_md5": md5s, "window_fp": fps}
            )

    return docs.mapInPandas(
        fp_batches, "doc_id bigint, content_md5 string, window_fp bigint"
    )


@register(
    "corpus_report",
    survey_ops=("TXT-quality", "A2", "A8"),
    # Promoted to the driver window r6 (rotation: one of the four specs that
    # had never earned a hash-checked driver row); takes over TXT-quality
    # from the folded text_quality_score per-doc rendering.
    doc="The mixture-designer's corpus recipe report: per (source, lang) "
    "cohort — doc count, total whitespace tokens, quality-filter pass "
    "rate, mean alpha ratio. One partial-agg groupBy over per-doc "
    "codegen'd expressions (the query a data-recipe review actually runs "
    "before setting mixture weights).",
    oracle="""
WITH d AS (
  SELECT source, lang,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM documents
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(SUM(CASE WHEN n_chars BETWEEN 50 AND 10000 AND alpha_ratio > 0.5
                      THEN 1.0 ELSE 0.0 END) / COUNT(*) + 1e-9, 4)
         AS pass_rate,
       ROUND(AVG(alpha_ratio) + 1e-9, 4) AS avg_alpha
FROM d GROUP BY source, lang
""",
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT parallelize_scan'd: avg(alpha_ratio) is an order-dependent float
    # accumulation whose rounded value the DuckDB oracle pins — keep the
    # scan's native partitioning (see parallelize_scan's contract)
    docs = load_table(spark, sf_dir, "documents")
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / F.length("text")
    )
    per_doc = docs.select(
        "source",
        "lang",
        F.size(_tok(F.col("text"))).alias("n_tokens"),
        # the shared gate, evaluated while text is still in scope
        F.when(quality_gate(), F.lit(1.0)).otherwise(F.lit(0.0)).alias("pass_flag"),
        alpha_ratio.alias("alpha_ratio"),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("pass_flag") / F.count(F.lit(1)) + F.lit(1e-9),
            4,
        ).alias("pass_rate"),
        F.round(F.avg("alpha_ratio") + F.lit(1e-9), 4).alias("avg_alpha"),
    )

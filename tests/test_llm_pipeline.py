"""The LLM-corpus curation loop on this engine, end-to-end:

near-dup dedup (MinHash-LSH pairs -> connected components -> keep one doc
per cluster) -> benchmark decontamination -> repetition filter -> domain
mixture sampling -> train/val/test split -> sequence packing. Mirrors how
a training-data pipeline composes the SURVEY §7.0 operator families,
which no single-operator test exercises as one chain — and pins that the
whole chain is DETERMINISTIC (content-keyed, never partition- or
order-dependent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columbiaimagesearch_spark.operators import dedup, hygiene, packing

from conftest import SF_SMOKE


def _curate(spark):
    """Run the full curation chain at sf0.001; returns (survivors_df,
    packed_df, counts dict)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    counts = {"input": docs.count()}

    # 1. near-dup dedup: keep the min doc_id of every near-dup cluster
    clusters = dedup.dedup_components(spark, SF_SMOKE)  # (doc_id, component)
    losers = clusters.where(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    counts["after_dedup"] = docs.count()

    # 2. decontamination against the stand-in benchmark set
    bench = docs.where(F.col("doc_id") % hygiene.BENCH_MOD == 0)
    train = docs.where(F.col("doc_id") % hygiene.BENCH_MOD != 0)
    verdicts = hygiene.decontaminate_from(train, bench)
    dirty = verdicts.where(F.col("contaminated")).select("doc_id")
    docs = train.join(dirty, "doc_id", "left_anti")
    counts["after_decontam"] = docs.count()

    # 3. repetition filter
    rep = hygiene.repetition_stats_from(docs)
    docs = docs.join(
        rep.where(F.col("repetitive")).select("doc_id"), "doc_id", "left_anti"
    )
    counts["after_repetition"] = docs.count()

    # 4. domain mixture + 5. split: both are pure content-hash functions,
    # so applying them to the curated subset keeps their per-doc verdicts
    mix = packing.llm_mixture_sample(spark, SF_SMOKE).select("doc_id", "keep")
    split = packing.llm_split_assign(spark, SF_SMOKE).select("doc_id", "split")
    docs = (
        docs.join(mix, "doc_id")
        .where(F.col("keep"))
        .join(split, "doc_id")
        .where(F.col("split") == "train")
        .drop("keep", "split")
    )
    counts["after_mix_split"] = docs.count()

    # 6. pack the survivors into fixed-budget sequences
    packed = packing.llm_seq_pack(spark, SF_SMOKE).join(
        docs.select("doc_id"), "doc_id", "left_semi"
    )
    counts["packed_docs"] = packed.count()
    return docs, packed, counts


def test_curation_chain_composes_and_is_deterministic(spark):
    docs, packed, counts = _curate(spark)
    # every stage is a filter: monotone non-increasing survivor counts
    order = ["input", "after_dedup", "after_decontam", "after_repetition", "after_mix_split"]
    vals = [counts[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    assert counts["after_mix_split"] > 0, counts
    assert counts["packed_docs"] == counts["after_mix_split"]

    # packing respects the token budget for multi-doc bins
    bins = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n_docs")
    )
    over = bins.where(
        (F.col("fill") > packing.PACK_BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert over == 0

    # determinism: a second full run reproduces the exact survivor set
    docs2, _, counts2 = _curate(spark)
    assert counts2 == counts
    assert (
        docs.select("doc_id").exceptAll(docs2.select("doc_id")).count() == 0
        and docs2.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    )

"""LLM layout operators (split assignment, sequence packing) — DuckDB
parity via the same harness as the registered specs, plus the packing
invariants that the hash can't express on its own."""

from __future__ import annotations

from columbiaimagesearch_spark.operators import packing
from columbiaimagesearch_spark.plans.explain import assert_broadcast_join, formatted_plan
from columbiaimagesearch_spark.plans.parity import compare
from columbiaimagesearch_spark.registry import QuerySpec

from conftest import SF_SMOKE


def _spec(name, builder, oracle):
    return QuerySpec(name=name, builder=builder, oracle=oracle, survey_ops=("LLM-layout",))


def test_split_assign_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec("llm_split_assign", packing.llm_split_assign, packing.SPLIT_ORACLE_SQL),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_seq_pack_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec("llm_seq_pack", packing.llm_seq_pack, packing.PACK_ORACLE_SQL),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_split_assign_plan_is_narrow(spark):
    """The rates dim broadcasts; no shuffle Exchange anywhere — the split
    assignment is a single narrow pass over the scan at any scale."""
    df = packing.llm_split_assign(spark, SF_SMOKE)
    assert_broadcast_join(df)
    plan = formatted_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan


def test_split_fractions_and_independence(spark):
    pdf = packing.llm_split_assign(spark, SF_SMOKE).toPandas()
    n = len(pdf)
    assert n > 0 and pdf["doc_id"].is_unique
    # 80/10/10 within hash-uniformity tolerance on 500 docs
    frac_train = (pdf["split"] == "train").mean()
    assert 0.7 < frac_train < 0.9
    assert set(pdf["split"]) == {"train", "val", "test"}
    # stratified keep honors the per-language permille rate directionally
    en_keep = pdf.loc[pdf["lang"] == "en", "keep"].mean() if (pdf["lang"] == "en").any() else 1.0
    assert en_keep == 1.0  # en rate is 1000 permille -> always kept
    # independence: the two bucket columns come from different salts
    assert (pdf["split_bucket"] != pdf["sample_bucket"]).any()


def test_seq_pack_invariants(spark):
    pdf = packing.llm_seq_pack(spark, SF_SMOKE).toPandas()
    assert pdf["doc_id"].is_unique  # every doc packed exactly once
    fills = pdf.groupby(["shard", "bin"])["n_tokens"].agg(["sum", "count"])
    # a bin exceeds the budget only when it holds a single oversized doc
    over = fills[fills["sum"] > packing.PACK_BUDGET]
    assert (over["count"] == 1).all()
    # bins are contiguous 0..max within each shard
    for _, g in pdf.groupby("shard"):
        bins = sorted(g["bin"].unique())
        assert bins == list(range(len(bins)))
    # greedy tightness: consecutive bins can't be merged — bin i's fill plus
    # bin i+1's FIRST doc must overflow the budget (first-fit-in-order)
    pdf = pdf.sort_values(["shard", "doc_id"])
    for _, g in pdf.groupby("shard"):
        sums = g.groupby("bin")["n_tokens"].sum()
        first = g.groupby("bin")["n_tokens"].first()
        for b in range(len(sums) - 1):
            assert sums[b] + first[b + 1] > packing.PACK_BUDGET


def test_seq_pack_partitioning_invariance(spark):
    """Assignments depend on content keys, not physical layout: change the
    shuffle partitioning under the groupBy and the packing is identical."""

    def run():
        return (
            packing.llm_seq_pack(spark, SF_SMOKE)
            .toPandas()
            .sort_values(["shard", "doc_id"])
            .reset_index(drop=True)
        )

    a = run()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a.equals(b)


def test_mixture_sample_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec("llm_mixture_sample", packing.llm_mixture_sample, packing.MIXTURE_ORACLE_SQL),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_mixture_upweights_rare_sources(spark):
    pdf = packing.llm_mixture_sample(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0 and pdf["doc_id"].is_unique
    per_src = pdf.drop_duplicates("source").sort_values("source_docs")
    # alpha < 1: keep rate is non-increasing as the source grows
    rates = per_src["rate_permille"].tolist()
    assert all(a >= b for a, b in zip(rates, rates[1:])), rates
    assert ((pdf["rate_permille"] >= 0) & (pdf["rate_permille"] <= 1000)).all()
    # realized keep fraction lands near the budget (cap + hash noise allowed)
    kept = pdf["keep"].mean()
    assert 0.25 < kept < 0.75, kept


def test_mixture_plan_broadcasts_rates_dim(spark):
    """The S-row rates dim broadcasts back to the corpus; no sort-merge
    join and no cartesian anywhere — the corpus-side cost is one narrow
    pass at any scale."""
    from columbiaimagesearch_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
        formatted_plan,
    )

    df = packing.llm_mixture_sample(spark, SF_SMOKE)
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_seq_pack_plan_shuffles_ints_only(spark):
    """Packing's one shuffle carries (shard, doc_id, n_tokens) ints — the
    text column must be pruned before the Exchange (ReadSchema keeps it,
    since n_tokens derives from it, but no string column crosses the
    shuffle boundary: the exchange input is the 3-int projection)."""
    from columbiaimagesearch_spark.plans.explain import formatted_plan

    df = packing.llm_seq_pack(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the pandas grouped-map is fed by the shard hash partitioning
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan, plan


def test_seq_pack_invariants_on_adversarial_lengths(spark):
    """Greedy first-fit invariants on a synthetic corpus mixing tiny,
    budget-sized, and oversized docs: bins are contiguous from 0 per shard,
    multi-doc bins never exceed the budget, oversized docs sit alone, and
    a doc is only ever in a later bin than the previous doc (order-greedy:
    no bin reuse after moving on)."""
    budget = 64
    rows = []
    for doc_id in range(200):
        n = [1, 7, 63, 64, 65, 200, 32, 33][doc_id % 8]
        rows.append((doc_id, " ".join("w" for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = packing.seq_pack_from(docs, budget=budget, shards=4).toPandas()
    assert len(pdf) == 200 and pdf["doc_id"].is_unique

    for shard, g in pdf.groupby("shard"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # bins contiguous from 0, non-decreasing in doc order
        assert g["bin"].iloc[0] == 0
        assert (g["bin"].diff().dropna() >= 0).all()
        assert (g["bin"].diff().dropna() <= 1).all()
        fills = g.groupby("bin")["n_tokens"].agg(["sum", "count"])
        multi = fills[fills["count"] > 1]
        assert (multi["sum"] <= budget).all(), (shard, multi)
        # oversized docs are always alone in their bin
        oversized_bins = set(g.loc[g["n_tokens"] > budget, "bin"])
        assert all(fills.loc[b, "count"] == 1 for b in oversized_bins)


def test_mixture_null_source_is_its_own_cohort(spark):
    """Review r13: the old inner equi-join silently dropped every
    NULL-source doc (no keep verdict at all). The null-safe join gives
    the NULL cohort its own rate row, so every input doc gets a verdict
    and total output cardinality equals input cardinality."""
    rows = [(i, "web" if i % 3 == 0 else None) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = packing.mixture_sample_from(docs).toPandas()
    assert len(out) == 60 and out["doc_id"].is_unique
    nulls = out[out["source"].isna()]
    assert len(nulls) == 40  # the NULL cohort survived with verdicts
    assert (nulls["source_docs"] == 40).all()
    assert nulls["keep"].notna().all()


def test_seq_pack_drops_null_text_instead_of_crashing(spark):
    """Review r13: size(split(NULL)) reached the pack kernel as NaN and
    int(NaN) crashed the whole shard task. NULL-text docs are now
    dropped up front — nothing to pack — and the rest pack normally."""
    rows = [(1, "a b c"), (2, None), (3, "d e"), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = packing.seq_pack_from(docs, budget=4, shards=2).toPandas()
    assert set(pdf["doc_id"]) == {1, 3}
    assert (pdf["n_tokens"] > 0).all()

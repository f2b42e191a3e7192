"""Corpus-hygiene operators (benchmark decontamination, repetition stats)
— DuckDB parity via the registered-spec harness plus the plan/behavior
properties the hash comparison can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from columbiaimagesearch_spark.operators import hygiene
from columbiaimagesearch_spark.plans.explain import assert_broadcast_join, formatted_plan
from columbiaimagesearch_spark.plans.parity import compare
from columbiaimagesearch_spark.registry import QuerySpec

from conftest import SF_SMOKE


def _spec(name, builder, oracle):
    return QuerySpec(name=name, builder=builder, oracle=oracle, survey_ops=("LLM-hygiene",))


def test_decontaminate_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec("llm_decontaminate", hygiene.llm_decontaminate, hygiene.DECONTAMINATE_ORACLE_SQL),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_repetition_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec(
            "text_repetition_stats",
            hygiene.text_repetition_stats,
            hygiene.REPETITION_ORACLE_SQL,
        ),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The benchmark n-gram set must broadcast — the corpus side is never
    shuffled for the join (no SortMergeJoin anywhere)."""
    df = hygiene.llm_decontaminate(spark, SF_SMOKE)
    assert_broadcast_join(df)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_decontaminate_excludes_benchmark_docs(spark):
    pdf = hygiene.llm_decontaminate(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0 and pdf["doc_id"].is_unique
    assert not (pdf["doc_id"] % hygiene.BENCH_MOD == 0).any()
    assert (pdf["n_hits"] <= pdf["n_ngrams"]).all()
    assert ((pdf["hit_frac"] >= 0) & (pdf["hit_frac"] <= 1.0001)).all()
    # flag is a pure function of n_hits
    assert (pdf["contaminated"] == (pdf["n_hits"] >= hygiene.MIN_HITS)).all()


def test_repetition_fractions_are_sane(spark):
    pdf = hygiene.text_repetition_stats(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0 and pdf["doc_id"].is_unique
    frac_cols = [c for c in pdf.columns if c.endswith("_frac")]
    for c in frac_cols:
        assert ((pdf[c] >= 0) & (pdf[c] <= 1.0001)).all(), c
    # ~30-word synthetic vocab over 100+-word docs: word repeats dominate
    assert (pdf["dup_word_frac"] > 0).mean() > 0.9
    # longer grams repeat no more often than shorter ones (per occurrence)
    assert (pdf["dup_3gram_frac"] <= pdf["dup_word_frac"] + 1e-9).all()


def test_ngram_rows_counts(spark):
    """Every doc with >= n words yields exactly len(words) - n + 1 rows."""
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    n = hygiene.N_GRAM
    got = hygiene.ngram_rows(docs, n).groupBy("doc_id").count()
    want = docs.select(
        "doc_id", (F.size(F.split(F.col("text"), " ")) - n + 1).alias("want")
    ).where(F.col("want") > 0)
    joined = want.join(got, "doc_id", "left").toPandas()
    assert (joined["count"] == joined["want"]).all()


def test_decontaminate_from_known_overlap(spark):
    """A planted 8-gram overlap is found; a disjoint doc is not."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    bench = mk([(100, "q w e r t y u i o p")])
    train = mk(
        [
            (1, "x " * 5 + "q w e r t y u i o p"),  # contains 3 bench 8-grams
            (2, "a b c d e f g h i j k l"),  # disjoint
            (3, "q w e r t y u i"),  # exactly one overlapping 8-gram
        ]
    )
    pdf = (
        hygiene.decontaminate_from(train, bench)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert pdf.loc[1, "n_hits"] == 3 and bool(pdf.loc[1, "contaminated"])
    assert pdf.loc[2, "n_hits"] == 0 and not pdf.loc[2, "contaminated"]
    assert pdf.loc[3, "n_hits"] == 1 and not pdf.loc[3, "contaminated"]


def test_repetition_stats_from_edge_cases(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    docs = mk(
        [
            (1, "a a a a a a"),  # fully degenerate
            (2, "a b"),  # too short: dropped
            (3, "a b c d e f"),  # all distinct
        ]
    )
    pdf = hygiene.repetition_stats_from(docs).toPandas().set_index("doc_id")
    assert 2 not in pdf.index
    assert pdf.loc[1, "top_word_frac"] == 1.0 and bool(pdf.loc[1, "repetitive"])
    assert pdf.loc[1, "dup_3gram_frac"] == 0.75  # 4 trigrams, 1 distinct
    assert pdf.loc[3, "dup_word_frac"] == 0.0
    assert not pdf.loc[3, "repetitive"]


def test_boilerplate_parity(spark, duck_smoke):
    res = compare(
        spark,
        _spec(
            "text_boilerplate_ngrams",
            hygiene.text_boilerplate_ngrams,
            hygiene.BOILERPLATE_ORACLE_SQL,
        ),
        SF_SMOKE,
        duck_smoke,
    )
    assert res.ok, res.detail


def test_boilerplate_counts_each_doc_once(spark):
    """A gram repeated many times inside ONE doc is not boilerplate."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    docs = mk(
        [
            (1, "x y z w " * 10),          # same 4-gram 10x in one doc
            (2, "a b c d q r s t"),
            (3, "a b c d u v w x"),
            (4, "a b c d m n o p"),        # "a b c d" spans 3 docs
        ]
    )
    pdf = hygiene.boilerplate_ngrams_from(docs).toPandas()
    grams = set(pdf["gram"])
    assert "a b c d" in grams
    row = pdf.set_index("gram").loc["a b c d"]
    assert row["n_docs"] == 3 and row["first_doc"] == 2
    assert not any(g.startswith("x y z") for g in grams)


def test_pii_scrub_behavior(spark):
    """Library-level scrub on hand-built PII: typed placeholders land, counts
    are per-pattern, clean text is untouched."""
    rows = [
        (1, "mail me at alice.smith+x@mail.example.org today"),
        (2, "call +44 20 7946 0958 or +1 555 0100 now"),
        (3, "server at 192.168.1.254 then 10.0.0.1"),
        (4, "no contact info here at all"),
        (5, "mixed: bob@ex.io and +1 555 0123 from 172.16.254.3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in hygiene.scrub_pii_from(docs).collect()
    }
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["scrubbed"]
    assert "alice" not in got[1]["scrubbed"]
    assert got[2]["n_phone"] == 2 and got[2]["scrubbed"].count("<PHONE>") == 2
    assert got[3]["n_ip"] == 2 and got[3]["scrubbed"].count("<IP>") == 2
    assert got[4]["scrubbed"] == got[4]["text"]
    assert (got[5]["n_email"], got[5]["n_ip"], got[5]["n_phone"]) == (1, 1, 1)
    for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in got[5]["scrubbed"]


def test_pii_counts_agree_with_scrubbed_text(spark):
    """Counts are computed on the text each pattern's replace actually sees:
    a phone- or IP-shaped span INSIDE an email must not be double-counted
    once the email replacement has consumed it."""
    rows = [
        (1, "contact bob+1-234-5678@ex.com today"),  # phone-like local part
        (2, "mail 1.2.3.4@host.org please"),  # ip-like local part
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hygiene.scrub_pii_from(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 0
    assert got[1]["scrubbed"] == "contact <EMAIL> today"
    assert got[2]["n_email"] == 1 and got[2]["n_ip"] == 0
    assert got[2]["scrubbed"] == "mail <EMAIL> please"


def test_substring_spans_full_coverage_on_verbatim_dup(spark):
    """A doc duplicated verbatim has EVERY gram duplicated, so both copies'
    covered-token union must equal the whole doc; a doc sharing nothing has
    zero coverage; docs shorter than SUB_L produce no grams but still
    appear with zeros."""
    from columbiaimagesearch_spark.operators import dedup

    words = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, words),
            (2, words),  # verbatim duplicate of doc 1
            (3, " ".join(f"u{i}" for i in range(15))),  # unique content
            (4, "tiny doc"),  # < SUB_L words: no grams
        ],
        "doc_id bigint, text string",
    )
    rows = {
        int(r["doc_id"]): r
        for r in dedup.substring_spans_from(docs).collect()
    }
    for d in (1, 2):
        assert rows[d]["dup_cover_tokens"] == 20
        assert rows[d]["n_dup_starts"] == 20 - dedup.SUB_L + 1
        assert rows[d]["flagged"] is True
    assert rows[3]["dup_cover_tokens"] == 0 and rows[3]["flagged"] is False
    assert rows[4]["n_tokens"] == 2 and rows[4]["n_dup_starts"] == 0


def test_substring_spans_bounds(spark):
    """Structural invariants on the real corpus: coverage never exceeds the
    doc, starts never exceed the gram count, fraction in [0, 1]."""
    from columbiaimagesearch_spark.operators import dedup
    from columbiaimagesearch_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bad = (
        dedup.substring_spans_from(docs)
        .where(
            (F.col("dup_cover_tokens") > F.col("n_tokens"))
            | (F.col("n_dup_starts") > F.greatest(F.col("n_tokens") - dedup.SUB_L + 1, F.lit(0)))
            | (F.col("dup_cover_frac") < 0)
            | (F.col("dup_cover_frac") > 1.0 + 1e-9)
        )
        .count()
    )
    assert bad == 0


def test_map_only_kernels_match_duckdb_on_adversarial_texts(spark):
    """The r4 map-only rewrites (repetition, substring spans) moved the
    per-doc math from SQL into Python kernels — this fuzzes the places
    Python/JVM/DuckDB string semantics could diverge (empty strings,
    repeated separators, unicode, all-same-token docs, HALF_UP rounding
    near boundaries) against the SAME DuckDB oracle SQL the driver runs,
    just over an adversarial corpus instead of the fixture."""
    import duckdb
    import math
    import pandas as pd

    from columbiaimagesearch_spark.operators import dedup
    from columbiaimagesearch_spark.registry import all_specs

    texts = [
        "",
        " ",
        "a",
        "a a",
        "a a a a a a a a a a",
        "a  b  a  b  a  b",                       # doubled separators
        "héllo wörld héllo wörld héllo wörld",     # unicode
        "it's \"quoted\" it's \"quoted\" it's \"quoted\"",
        ("x y z " * 50).strip(),                   # long repeated trigram
        " ".join(f"w{i}" for i in range(40)),      # all-distinct
        "x y z " * 3 + " ".join(f"q{i}" for i in range(10)),
    ]
    docs_pd = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    docs = spark.createDataFrame(docs_pd)
    con = duckdb.connect()
    con.register("documents", docs_pd)

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    for spec_name, builder in [
        ("text_repetition_stats", lambda: hygiene.repetition_stats_from(docs)),
        ("dedup_substring_spans", lambda: dedup.substring_spans_from(docs)),
    ]:
        oracle_sql = all_specs()[spec_name].oracle_for("unused")
        got = norm(builder().toPandas())
        want = norm(con.execute(oracle_sql).fetchdf())
        assert list(got.columns) == list(want.columns), spec_name
        assert len(got) == len(want), f"{spec_name}: {len(got)} vs {len(want)}"
        for col in got.columns:
            for i, (x, y) in enumerate(zip(got[col], want[col])):
                same = (x == y) or (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and (x == y or (math.isnan(x) and math.isnan(y)))
                )
                assert same, f"{spec_name}.{col}[{i}]: spark={x!r} oracle={y!r}"


def test_components_driver_fast_path_equals_distributed(spark):
    """connected_components' two physical strategies (driver union-find for
    small graphs, iterative distributed min-label propagation) must produce
    the identical (doc_id, component) labeling — including chain-shaped
    graphs where min labels must propagate transitively, and singletons."""
    from columbiaimagesearch_spark.operators import dedup

    nodes = spark.range(0, 30).selectExpr("id as doc_id")
    # a 6-node chain, a triangle, a 2-cycle, rest singletons
    pairs = spark.createDataFrame(
        [
            (1, 5), (5, 9), (9, 13), (13, 17), (17, 21),  # chain -> min 1
            (2, 6), (6, 10), (2, 10),                      # triangle -> min 2
            (26, 28),                                      # pair -> min 26
        ],
        "doc_a long, doc_b long",
    ).withColumn("jaccard", F.lit(1.0))
    fast = {
        (r["doc_id"], r["component"])
        for r in dedup.connected_components(nodes, pairs).collect()
    }
    dist = {
        (r["doc_id"], r["component"])
        for r in dedup.connected_components(
            nodes, pairs, driver_max_edges=0
        ).collect()
    }
    assert fast == dist
    lab = dict(fast)
    assert all(lab[x] == 1 for x in (1, 5, 9, 13, 17, 21))
    assert all(lab[x] == 2 for x in (2, 6, 10))
    assert lab[26] == 26 and lab[28] == 26
    assert lab[0] == 0 and lab[29] == 29  # singletons


def test_fuzzy_decontaminate_catches_paraphrase_exact_misses(spark):
    """The r8 fuzzy variant's reason to exist: a train doc that edits every
    8th token of an eval doc shares ZERO exact 8-grams (decontaminate_from
    says clean) but keeps shingle Jaccard far above 0.5 — the fuzzy verdict
    must flag it; an unrelated doc must stay clean in both."""
    from pyspark.sql import Row

    base = [f"w{i}" for i in range(32)]
    edited = list(base)
    for p in (3, 11, 19, 27):  # max clean gap 7 < 8 -> no shared 8-gram
        edited[p] = f"x{p}"
    rows_bench = [Row(doc_id=1, text=" ".join(base))]
    rows_train = [
        Row(doc_id=10, text=" ".join(edited)),
        Row(doc_id=11, text=" ".join(f"z{i}" for i in range(32))),
    ]
    bench = spark.createDataFrame(rows_bench)
    train = spark.createDataFrame(rows_train)

    exact = {
        r["doc_id"]: r["contaminated"]
        for r in hygiene.decontaminate_from(train, bench).collect()
    }
    fuzzy = {
        r["doc_id"]: (r["contaminated"], r["max_jaccard"])
        for r in hygiene.fuzzy_decontaminate_from(train, bench).collect()
    }
    assert exact[10] is False and exact[11] is False  # exact 8-gram blind
    assert fuzzy[10][0] is True and fuzzy[10][1] >= 0.5
    assert fuzzy[11][0] is False and fuzzy[11][1] == 0.0


def test_fuzzy_decontaminate_broadcasts_bench_side(spark):
    """All three joins (bench band table, bench hash sets, final per-doc
    aggregate) must be broadcast — the corpus side never shuffles anything
    wider than (doc_id, jac) scalars (the 100 TB contract)."""
    from columbiaimagesearch_spark.operators.hygiene import (
        llm_fuzzy_decontaminate,
    )

    plan = formatted_plan(llm_fuzzy_decontaminate(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_fuzzy_decontaminate_hashes_corpus_once(spark):
    """The r9 plan contract (VERDICT r8 'What's wrong #1' + ADVICE): the
    corpus text is shingle-hashed ONCE per execution — the band table and
    the verify side are two references to one cached (doc_id, hs)
    relation (the broadcast candidate build materializes it, the verify
    probe reads it back), and the verify join BROADCASTS the candidates
    so the cached corpus relation is probed in place, never shuffled by
    doc_id. With the train side on parquet and the bench side a local
    relation, the parquet scans in the plan are train-only: exactly one
    reads `text` (the single cache-build subtree, displayed once); the
    only other is the doc_id-only completeness scan (column-pruned)."""
    from pyspark.sql import Row

    train = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = spark.createDataFrame(
        [Row(doc_id=1_000_001, text=" ".join(f"w{i}" for i in range(32)))]
    )
    plan = formatted_plan(hygiene.fuzzy_decontaminate_from(train, bench))
    schemas = [
        ln.strip() for ln in plan.splitlines() if "ReadSchema:" in ln
    ]
    assert sorted(schemas) == sorted(
        [
            "ReadSchema: struct<doc_id:bigint>",  # completeness join, id-pruned
            "ReadSchema: struct<doc_id:bigint,text:string>",  # ONE hash build
        ]
    ), plan[:3000]
    assert "InMemoryTableScan" in plan  # both references read the cache
    assert "SortMergeJoin" not in plan  # corpus probed map-side, not shuffled


def test_fuzzy_decontaminate_hashed_contract_reuses_caller_relations(spark):
    """near_dup_pairs_from's hashed contract, mirrored (ADVICE r8): an
    eager caller passes its own (doc_id, hs) relations and owns their
    persist/unpersist lifecycle; results are identical to the self-built
    path."""
    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators.dedup import hashed_from

    base = [f"w{i}" for i in range(32)]
    edited = list(base)
    for p in (3, 11, 19, 27):
        edited[p] = f"x{p}"
    bench = spark.createDataFrame([Row(doc_id=1, text=" ".join(base))])
    train = spark.createDataFrame(
        [
            Row(doc_id=10, text=" ".join(edited)),
            Row(doc_id=11, text=" ".join(f"z{i}" for i in range(32))),
        ]
    )
    h_t = hashed_from(train)  # caller-owned persist
    h_b = hashed_from(bench)
    try:
        got = {
            r["doc_id"]: (r["contaminated"], r["max_jaccard"])
            for r in hygiene.fuzzy_decontaminate_from(
                train, bench, hashed_train=h_t, hashed_bench=h_b
            ).collect()
        }
    finally:
        h_t.unpersist()
        h_b.unpersist()
    self_built = {
        r["doc_id"]: (r["contaminated"], r["max_jaccard"])
        for r in hygiene.fuzzy_decontaminate_from(train, bench).collect()
    }
    assert got == self_built
    assert got[10][0] is True and got[11] == (False, 0.0)


def test_contamination_report_attributes_leaks_per_bench_doc(spark):
    """The report is the transpose of the verdicts: a bench doc with one
    verbatim clone and one paraphrase in train shows exactly 1 exact leak
    (the clone), 2 fuzzy leaks (clone jac=1.0 + paraphrase above
    threshold), worst_jaccard 1.0; an unleaked bench doc reports zeros
    and still appears (completeness)."""
    from pyspark.sql import Row

    base = [f"rp{i}t" for i in range(32)]
    edited = list(base)
    for p in (3, 11, 19, 27):
        edited[p] = f"pp{p}u"
    bench = spark.createDataFrame(
        [
            Row(doc_id=97, text=" ".join(base)),  # leaked
            Row(doc_id=194, text=" ".join(f"cl{i}n" for i in range(32))),
        ]
    )
    train = spark.createDataFrame(
        [
            Row(doc_id=10, text=" ".join(base)),  # verbatim clone
            Row(doc_id=11, text=" ".join(edited)),  # paraphrase
            Row(doc_id=12, text=" ".join(f"zz{i}w" for i in range(32))),
        ]
    )
    rows = {
        int(r["bench_doc"]): r
        for r in hygiene.contamination_report_from(train, bench).collect()
    }
    assert set(rows) == {97, 194}
    leaked = rows[97]
    assert leaked["n_exact_leaks"] == 1  # only the clone shares 8-grams
    assert leaked["n_fuzzy_leaks"] == 2  # clone + paraphrase
    assert leaked["worst_jaccard"] == 1.0
    clean = rows[194]
    assert (
        clean["n_exact_leaks"],
        clean["n_fuzzy_leaks"],
        clean["worst_jaccard"],
    ) == (0, 0, 0.0)


def test_ngram_novelty_planted(spark):
    """ngram_novelty_from hand-checked: a verbatim clone of an earlier doc
    scores novelty 0 (every gram first seen at the original), a unique doc
    scores 1.0, a half-copied doc lands in between, and a doc shorter than
    the gram width scores 1.0 with zero grams."""
    from pyspark.sql import Row

    base = [f"nv{i}q" for i in range(32)]  # 32 words -> 25 distinct 8-grams
    half = base[:16] + [f"hx{i}m" for i in range(16)]
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(base)),
            Row(doc_id=2, text=" ".join(base)),  # clone of 1
            Row(doc_id=3, text=" ".join(half)),  # first 16 words shared
            Row(doc_id=4, text=" ".join(f"un{i}z" for i in range(32))),
            Row(doc_id=5, text="too short"),  # < 8 words
        ]
    )
    rows = {
        int(r["doc_id"]): r for r in hygiene.ngram_novelty_from(docs).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}
    assert (rows[1]["n_grams"], rows[1]["n_seen"], rows[1]["novelty"]) == (25, 0, 1.0)
    assert (rows[2]["n_grams"], rows[2]["n_seen"], rows[2]["novelty"]) == (25, 25, 0.0)
    # doc 3 shares exactly the 9 grams fully inside base[:16] (positions
    # 0..8 of the 8-gram window); its other 16 grams are new
    assert rows[3]["n_grams"] == 25 and rows[3]["n_seen"] == 9
    assert rows[3]["novelty"] == round(1 - 9 / 25 + 1e-9, 4)
    assert (rows[4]["n_seen"], rows[4]["novelty"]) == (0, 1.0)
    assert (rows[5]["n_grams"], rows[5]["n_seen"], rows[5]["novelty"]) == (0, 0, 1.0)


def test_split_leakage_planted_twin(spark):
    """split_leakage_from hand-checked: give a known-heldout doc a
    near-verbatim twin at a known-train doc_id (split membership comes
    from the salted-hash split function itself, so the test discovers the
    ids rather than assuming them); the heldout doc must report exactly
    one train twin, and an unrelated heldout doc must report zero."""
    from pyspark.sql import Row

    from columbiaimagesearch_spark.operators import packing

    ids = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id bigint, lang string"
    )
    sp = {
        int(r["doc_id"]): r["split"]
        for r in packing.split_assign_from(ids).collect()
    }
    train_id = next(i for i in range(100) if sp[i] == "train")
    held = [i for i in range(100) if sp[i] != "train"]
    leak_id, clean_id = held[0], held[1]

    base = [f"lk{i}t" for i in range(40)]
    twin = list(base)
    twin[39] = "edited"  # near-verbatim: shingle Jaccard just under 1.0
    docs = spark.createDataFrame(
        [
            Row(doc_id=train_id, text=" ".join(base), lang="en"),
            Row(doc_id=leak_id, text=" ".join(twin), lang="en"),
            Row(doc_id=clean_id, text=" ".join(f"cz{i}o" for i in range(40)), lang="en"),
        ]
    )
    rows = {
        int(r["doc_id"]): r
        for r in hygiene.split_leakage_from(docs).collect()
    }
    assert set(rows) == {leak_id, clean_id}  # heldout docs only
    assert rows[leak_id]["leaked"] and rows[leak_id]["n_train_twins"] == 1
    assert rows[leak_id]["max_jaccard"] > 0.9
    assert not rows[clean_id]["leaked"]
    assert rows[clean_id]["n_train_twins"] == 0
    assert rows[clean_id]["max_jaccard"] == 0.0


def test_embedding_decontaminate_catches_planted_paraphrase(spark):
    """The embedding rung exists to catch what the lexical ladder cannot:
    a paraphrase has low n-gram overlap but near-identical embedding.
    Plant near-copies of bench vectors (cos ~ 1.0) in a corpus of random
    distractors: every plant must be flagged with the right twin count,
    and every flag must agree with the brute-force ground truth (the
    verify step makes false positives impossible; pin it anyway)."""
    import numpy as np
    from pyspark.sql import Row

    rng = np.random.RandomState(7)
    d = 16
    B = rng.randn(8, d)
    plants = B[:4] + 1e-6 * rng.randn(4, d)  # paraphrases of bench 0..3
    distract = rng.randn(20, d)
    corpus = np.vstack([plants, distract])
    bench_df = spark.createDataFrame(
        [Row(vec_id=100 + i, v=[float(x) for x in row]) for i, row in enumerate(B)]
    )
    corpus_df = spark.createDataFrame(
        [Row(vec_id=i, v=[float(x) for x in row]) for i, row in enumerate(corpus)]
    )
    got = {
        int(r["vec_id"]): r
        for r in hygiene.embedding_decontaminate_from(
            corpus_df, bench_df
        ).collect()
    }
    assert set(got) == set(range(len(corpus)))  # completeness: every row
    # brute-force ground truth
    Bn = B / np.sqrt((B * B).sum(1))[:, None]
    Cn = corpus / np.sqrt((corpus * corpus).sum(1))[:, None]
    cos = Cn @ Bn.T
    truth_n = (cos >= hygiene.EMB_DECON_COS).sum(axis=1)
    for i in range(4):  # the plants: cos ~ 1.0 -> band keys match surely
        assert got[i]["contaminated"], f"planted paraphrase {i} missed"
        assert got[i]["max_cos"] > 0.99
    for i in range(len(corpus)):
        # the probe can only UNDER-report vs truth (LSH recall), never over
        assert got[i]["n_bench_twins"] <= int(truth_n[i])
        if not truth_n[i]:
            assert not got[i]["contaminated"], f"false positive at {i}"


def test_embedding_decontaminate_recall_floor_on_fixture(spark):
    """Probe recall vs brute force over the fixture embeddings at the
    registered knobs: the LSH candidate step may drop borderline pairs
    (band-OR recall < 1) but must stay above the family's floor, and
    every reported twin must be a true twin."""
    import numpy as np
    import pyarrow.parquet as pq

    spec = __import__(
        "columbiaimagesearch_spark.registry", fromlist=["all_specs"]
    ).all_specs()["llm_embedding_decontaminate"]
    got = {
        int(r["vec_id"]): int(r["n_bench_twins"])
        for r in spec.builder(spark, SF_SMOKE).collect()
    }
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    Xn = X / np.sqrt((X * X).sum(1))[:, None]
    is_bench = ids % hygiene.EMB_BENCH_MOD == 0
    cos = Xn[~is_bench] @ Xn[is_bench].T
    truth = {
        int(i): int(n)
        for i, n in zip(ids[~is_bench], (cos >= hygiene.EMB_DECON_COS).sum(1))
    }
    assert set(got) == set(truth)
    found = sum(got.values())
    true_pairs = sum(truth.values())
    assert all(got[i] <= truth[i] for i in got), "probe over-reported"
    assert true_pairs > 0, "fixture has no planted twins — test is vacuous"
    assert found / true_pairs >= 0.7, (found, true_pairs)


def test_embedding_decontaminate_refuses_oversized_bench(spark):
    """A 'bench' side too big to broadcast is a corpus: refuse loudly and
    point at the symmetric self-join instead of silently collecting GiBs
    onto the driver."""
    import numpy as np
    import pytest
    from pyspark.sql import Row

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [Row(vec_id=i, v=[float(x) for x in rng.randn(8)]) for i in range(64)]
    )
    with pytest.raises(RuntimeError, match="max_bench_bytes"):
        hygiene.embedding_decontaminate_from(df, df, max_bench_bytes=64)


def test_embedding_decontaminate_probe_telemetry(spark):
    """DeconProbeStats observes the true max candidate-set size — a
    degenerate SUITE (identical bench vectors piling into one bucket)
    makes every colliding corpus row verify the whole suite; the metric a
    cluster run should export (family pattern: LshBucketStats)."""
    import numpy as np
    from pyspark.sql import Row

    clone = [1.0, 0.5, -0.25, 2.0, 0.1, -1.0, 0.7, 0.3]
    bench = spark.createDataFrame(
        [Row(vec_id=100 + i, v=clone) for i in range(30)]  # degenerate suite
    )
    rng = np.random.RandomState(5)
    corpus = spark.createDataFrame(
        [Row(vec_id=0, v=clone)]  # collides with ALL 30 suite rows
        + [
            Row(vec_id=1 + i, v=[float(x) for x in rng.randn(8)])
            for i in range(20)
        ]
    )
    stats = hygiene.DeconProbeStats(spark)
    out = hygiene.embedding_decontaminate_from(corpus, bench, stats=stats)
    rows = {int(r["vec_id"]): r for r in out.collect()}
    assert stats.max_candidates == 30  # the clone row probed the whole suite
    assert rows[0]["n_bench_twins"] == 30 and rows[0]["contaminated"]


def test_embedding_decontaminate_exact_mode_is_brute_force(spark, duck_smoke):
    """exact=True verifies every corpus row against the whole suite:
    verdicts must equal the brute-force ground truth EXACTLY (recall 1.0
    by construction) and dominate the LSH probe's per-row counts. The
    truth side here is INDEPENDENT — DuckDB's list_inner_product over the
    same parquet — so this is a cross-engine check of the verdict math,
    not a twin of it."""
    import numpy as np

    from pyspark.sql import functions as F

    from columbiaimagesearch_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    is_bench = (F.col("vec_id") % hygiene.EMB_BENCH_MOD) == 0
    corpus, bench = emb.where(~is_bench), emb.where(is_bench)
    got = {
        int(r["vec_id"]): r
        for r in hygiene.embedding_decontaminate_from(
            corpus, bench, exact=True
        ).collect()
    }
    probe = {
        int(r["vec_id"]): r
        for r in hygiene.embedding_decontaminate_from(corpus, bench).collect()
    }
    truth = {
        int(r[0]): (int(r[1]), float(r[2]) if r[2] is not None else 0.0)
        for r in duck_smoke.execute(f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            n AS (SELECT vec_id,
                         list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS u
                  FROM e)
            SELECT c.vec_id,
                   SUM(CASE WHEN list_inner_product(c.u, b.u)
                            >= {hygiene.EMB_DECON_COS} THEN 1 ELSE 0 END),
                   MAX(CASE WHEN list_inner_product(c.u, b.u)
                            >= {hygiene.EMB_DECON_COS}
                       THEN list_inner_product(c.u, b.u) END)
            FROM n c, n b
            WHERE c.vec_id % {hygiene.EMB_BENCH_MOD} != 0
              AND b.vec_id % {hygiene.EMB_BENCH_MOD} = 0
            GROUP BY c.vec_id
        """).fetchall()
    }
    assert set(got) == set(truth)
    for vid, (n_true, mx_true) in truth.items():
        r = got[vid]
        assert r["n_bench_twins"] == n_true, (vid, r, n_true)
        if n_true:
            # engines sum the dot product in different orders; both
            # sides round to 4dp so any residual is last-ulp noise
            assert abs(r["max_cos"] - round(mx_true, 4)) <= 1e-9
        assert r["n_bench_twins"] >= probe[vid]["n_bench_twins"]  # dominates
    n_exact = sum(r["n_bench_twins"] for r in got.values())
    n_probe = sum(r["n_bench_twins"] for r in probe.values())
    assert n_exact > n_probe  # the fixture's borderline pairs exist


def test_embedding_decontaminate_zero_vector_contract(spark):
    """Zero-vector contract, end-to-end through the distributed kernel
    (similarity.l2_normalize_rows): an all-zero corpus embedding — which
    the naive normalize turned into a NaN row whose every comparison was
    silently False — is reported finite, max_cos == 0.0, contaminated ==
    False in BOTH probe and exact modes; a zero BENCH row never flags
    anything. Exact copies planted next to the zero row still flag."""
    import math

    import numpy as np
    from pyspark.sql import Row

    rng = np.random.RandomState(11)
    d = 16
    B = rng.randn(6, d)
    B[5] = 0.0  # zero bench row
    corpus = np.vstack([np.zeros((1, d)), B[:2], rng.randn(5, d)])
    bench_df = spark.createDataFrame(
        [Row(vec_id=100 + i, v=[float(x) for x in r]) for i, r in enumerate(B)]
    )
    corpus_df = spark.createDataFrame(
        [Row(vec_id=i, v=[float(x) for x in r]) for i, r in enumerate(corpus)]
    )
    for exact in (False, True):
        got = {
            int(r["vec_id"]): r
            for r in hygiene.embedding_decontaminate_from(
                corpus_df, bench_df, exact=exact
            ).collect()
        }
        assert set(got) == set(range(len(corpus)))  # zero row not dropped
        z = got[0]
        assert not z["contaminated"] and z["n_bench_twins"] == 0
        assert z["max_cos"] == 0.0 and not math.isnan(z["max_cos"])
        for i in (1, 2):  # exact bench copies still flagged
            assert got[i]["contaminated"] and got[i]["max_cos"] > 0.99
        for i, r in got.items():
            assert not math.isnan(r["max_cos"]), (exact, i)
            # the zero BENCH row can never be anyone's twin: its cosine
            # is 0.0 < threshold, so nothing reports 6 twins
            assert r["n_bench_twins"] <= 5


def test_embedding_decontaminate_probe_path_independent_duckdb(spark, duck_smoke):
    """VERDICT r11 what's-wrong #1: the probe path's driver oracle is a
    shared-kernel twin, so it only proves distributed == driver-side of
    the SAME math. This is the INDEPENDENT probe-path check: DuckDB
    reconstructs the whole probe in SQL — the seeded hyperplanes
    materialized as a VALUES relation, sign bits via its own
    list_inner_product, keys bit-packed per band, the candidate set as a
    band-key collision join, and the verdict as brute-force cosine
    FILTERED by that collision predicate. The Spark probe output must
    match this SQL-only reconstruction row for row (banding keys are
    cross-checked first so a sign-boundary ulp would be attributable)."""
    import numpy as np
    from pyspark.sql import functions as F

    from columbiaimagesearch_spark.operators.similarity import (
        LSH_BANDS,
        LSH_BITS,
        LSH_SEED,
        _lsh_band_keys,
        lsh_keys_cte_sql,
    )
    from columbiaimagesearch_spark.sources import load_table

    mod, thr = hygiene.EMB_BENCH_MOD, hygiene.EMB_DECON_COS
    # the shared SQL reconstruction (review r13: one definition, composed
    # here and by the similarity oracles); leg 1 below still checks it
    # against the INDEPENDENT numpy kernel, so a helper bug cannot
    # self-confirm
    keys_cte = f"""
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        {lsh_keys_cte_sql(64, LSH_BANDS, LSH_BITS, LSH_SEED)}
    """
    # leg 1: DuckDB's banding == the numpy kernel's (attributes any later
    # mismatch: a key disagreement would be a sign-boundary ulp, a verdict
    # disagreement with equal keys would be a probe bug)
    duck_keys = {
        (int(r[0]), int(r[1])): int(r[2])
        for r in duck_smoke.execute(
            f"WITH {keys_cte} SELECT vec_id, band, key FROM keys"
        ).fetchall()
    }
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    np_keys = _lsh_band_keys(X, LSH_BANDS, LSH_BITS, LSH_SEED)
    for i, vid in enumerate(ids):
        for b in range(LSH_BANDS):
            assert duck_keys[(int(vid), b)] == int(np_keys[i, b]), (vid, b)

    # leg 2: probe verdicts == brute-force cosine filtered by the
    # SQL-computed band-collision predicate
    truth = {
        int(r[0]): (int(r[1]), float(r[2]))
        for r in duck_smoke.execute(f"""
            WITH {keys_cte},
            collide AS (
              SELECT DISTINCT ck.vec_id AS cid, bk.vec_id AS bid
              FROM keys ck JOIN keys bk
                ON ck.band = bk.band AND ck.key = bk.key
              WHERE ck.vec_id % {mod} != 0 AND bk.vec_id % {mod} = 0
            ),
            n AS (SELECT vec_id,
                         list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS u
                  FROM e)
            SELECT cu.vec_id,
                   COALESCE(SUM(CASE WHEN list_inner_product(cu.u, bu.u) >= {thr}
                                     THEN 1 ELSE 0 END), 0),
                   COALESCE(MAX(CASE WHEN list_inner_product(cu.u, bu.u) >= {thr}
                                     THEN list_inner_product(cu.u, bu.u) END), 0.0)
            FROM n cu
            LEFT JOIN collide ON collide.cid = cu.vec_id
            LEFT JOIN n bu ON bu.vec_id = collide.bid
            WHERE cu.vec_id % {mod} != 0
            GROUP BY cu.vec_id
        """).fetchall()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    is_bench = (F.col("vec_id") % mod) == 0
    got = {
        int(r["vec_id"]): r
        for r in hygiene.embedding_decontaminate_from(
            emb.where(~is_bench), emb.where(is_bench),
            bands=LSH_BANDS, bits=LSH_BITS, seed=LSH_SEED,
        ).collect()
    }
    assert set(got) == set(truth)
    any_twins = False
    for vid, (n_true, mx_true) in truth.items():
        r = got[vid]
        assert r["n_bench_twins"] == n_true, (vid, dict(r.asDict()), n_true)
        assert abs(r["max_cos"] - round(mx_true, 4)) <= 1e-9, (vid, r, mx_true)
        assert r["contaminated"] == (n_true > 0)
        any_twins = any_twins or n_true > 0
    assert any_twins  # the fixture plants real probe hits

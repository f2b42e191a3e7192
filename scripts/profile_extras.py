#!/usr/bin/env python
"""Job/stage/task attribution for the bench EXTRAS paths (curation_full,
train, layout write) — the three most expensive measured paths in the repo
(VERDICT r16 next-round #2/#3). Wraps each section with the statusTracker
job-count probe profile_queries.py uses for headline queries, plus a
per-phase wall breakdown where the section is a composition (curate_docs'
eager stages).

Usage: python scripts/profile_extras.py [curation_full|train|layout|curation]...
Run alone on an idle host; numbers are for RELATIVE attribution.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from columbiaimagesearch_spark.session import get_spark  # noqa: E402


def job_stats(tracker, jobs0: set[int]) -> tuple[int, int, int]:
    jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in jobs0]
    n_stages = 0
    n_tasks = 0
    for jid in jobs:
        ji = tracker.getJobInfo(jid)
        if not ji:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si:
                n_stages += 1
                n_tasks += si.numTasks
    return len(jobs), n_stages, n_tasks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    which = sys.argv[1:] or ["curation_full", "train", "layout"]
    spark = get_spark("profile-extras")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    import bench as bench_mod

    def probe(name: str, fn):
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        nj, ns, nt = job_stats(tracker, jobs0)
        print(f"{name:34s} wall={wall:7.3f}s jobs={nj:3d} stages={ns:3d} tasks={nt:5d}")
        return out

    # shared warm-up: mirror bench.py so first-execution JIT noise is out
    from columbiaimagesearch_spark.operators.relational import a8_distinct

    a8_distinct(spark, sf_dir).count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    from columbiaimagesearch_spark.lopq.queries import fixture_model

    fixture_model(spark, sf_dir)

    for w in which:
        if w in ("curation", "curation_full"):
            full = w == "curation_full"
            # warm pass (bench med(warm=True) does the same), then phased run
            probe(f"{w} warm", lambda: bench_mod.curation_bench(spark, sf_dir, full=full))
            for i in range(2):
                probe(f"{w} sample{i}", lambda: bench_mod.curation_bench(spark, sf_dir, full=full))
            # phase breakdown: re-run curate_docs with stage probes
            from columbiaimagesearch_spark import curate as curate_mod
            from columbiaimagesearch_spark.sources import load_table
            from pyspark.sql import functions as F

            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text", "lang", "source"
            )
            bench_docs = None
            if full:
                from columbiaimagesearch_spark.operators.hygiene import BENCH_MOD

                is_bench = (F.col("doc_id") % BENCH_MOD) == 0
                bench_docs = docs.where(is_bench).select("doc_id", "text")
                docs = docs.where(~is_bench)
            res = probe(
                f"{w} curate_docs() call",
                lambda: curate_mod.curate_docs(
                    docs, bench_docs, train_split_only=False, scrub_pii=full,
                    quality_filter=full, fuzzy_decontaminate=full,
                ),
            )
            probe(f"{w} packed noop", lambda: res.packed.write.mode("overwrite").format("noop").save())
        elif w == "train":
            probe("train warm", lambda: bench_mod.train_bench(spark, sf_dir))
            for i in range(2):
                probe(f"train sample{i}", lambda: bench_mod.train_bench(spark, sf_dir))
            # phase breakdown
            from columbiaimagesearch_spark.lopq import twin
            from columbiaimagesearch_spark.lopq import train_spark as ts
            from columbiaimagesearch_spark.sources import load_table

            vec_df = load_table(spark, sf_dir, "embeddings").selectExpr(
                "vec_id as id", "cast(embedding as array<double>) as v"
            )
            probe("train fit_spark only", lambda: ts.fit_spark(
                vec_df, init_sample=twin.SAMPLE_LIMIT, **twin.TRAIN_PARAMS
            ))
        elif w == "layout":
            probe("layout warm", lambda: bench_mod.layout_search_bench(spark, sf_dir))
            for i in range(2):
                probe(f"layout sample{i}", lambda: bench_mod.layout_search_bench(spark, sf_dir))
            # phase breakdown of the write path
            import shutil
            import tempfile

            from columbiaimagesearch_spark.lopq import layout
            from columbiaimagesearch_spark.lopq.queries import codes_df

            codes = codes_df(spark, sf_dir)
            path = tempfile.mkdtemp(prefix="codes_layout_prof_")
            try:
                probe("layout write_codes_partitioned", lambda: layout.write_codes_partitioned(
                    codes, path, bucket_cells=8
                ))
            finally:
                shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query cost breakdown: builder (DataFrame construction), Catalyst
analyze+optimize+physical-plan, and execution through the noop sink.

Usage: python scripts/profile_queries.py [query ...]   (default: bench slow set)

Prints, per query: t_build, t_plan (executedPlan forced), t_exec (noop write,
median of N), and the job count the execution submitted (AQE re-optimizations
and eager subjobs show up here — a query whose wall is mostly scheduling has
many jobs with tiny input). Run alone on an idle host; numbers are for
RELATIVE attribution, not round-over-round comparison.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from columbiaimagesearch_spark import registry  # noqa: E402
from columbiaimagesearch_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "emb_lsh_near_dup_pairs",
    "dedup_minhash_lsh_pairs",
    "llm_fuzzy_decontaminate",
    "j2_explode_join",
    "dedup_substring_spans",
    "w_event_windows",
    "t4_per_group_topk",
    "lopq_search_rerank",
    "llm_decontaminate",
    "ann_ivf_topk",
    "j_asof_latest_order",
    "text_boilerplate_ngrams",
    "q18_large_volume_customer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    n = int(os.environ.get("PROFILE_N", "3"))
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    from columbiaimagesearch_spark.lopq.queries import fixture_model
    from columbiaimagesearch_spark.operators.ann_ivf import train_centroids

    fixture_model(spark, sf_dir)
    train_centroids(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm everything once
    for name in names:
        specs[name].builder(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    print(f"{'query':32s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'jobs':>5s} {'stages':>6s}")
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0
        execs = []
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        stage_ids0 = set()
        for jid in tracker.getJobIdsForGroup(None) or []:
            ji = tracker.getJobInfo(jid)
            if ji:
                stage_ids0.update(ji.stageIds)
        for _ in range(n):
            df2 = specs[name].builder(spark, sf_dir)
            t0 = time.perf_counter()
            df2.write.mode("overwrite").format("noop").save()
            execs.append(time.perf_counter() - t0)
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        stage_ids1 = set()
        for jid in tracker.getJobIdsForGroup(None) or []:
            ji = tracker.getJobInfo(jid)
            if ji:
                stage_ids1.update(ji.stageIds)
        t_exec = statistics.median(execs)
        print(
            f"{name:32s} {t_build*1000:6.0f}m {t_plan*1000:6.0f}m "
            f"{t_exec:7.3f} {(jobs1-jobs0)/n:5.1f} "
            f"{(len(stage_ids1)-len(stage_ids0))/n:6.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stage-level attribution of the 1M emb-LSH probe (VERDICT r16 #1
residual hunt): replicate test_lsh_1m_probe's timed region, read back
per-job wall + stage/task shape from the status tracker, bracket with
CPU calib. Optionally sweep the banded-exchange width.

Usage: python scripts/profile_lsh_1m.py [n_rows] [rows_per_task ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, str(Path(REPO) / "tests"))

from bench import cpu_calibration_sec  # noqa: E402
from columbiaimagesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rpts = [int(x) for x in sys.argv[2:]] or [None]
    spark = get_spark("profile-lsh-1m")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    tracker = sc.statusTracker()
    import synth_corpus as synth
    from columbiaimagesearch_spark.operators import similarity as sim

    vecs = synth.gen_embeddings(spark, n, 5000 if n >= 500_000 else n // 100).persist()
    vecs.count()
    # worker-pool warm (bench/test methodology)
    warm = synth.gen_embeddings(spark, 50_000, 500).persist()
    warm.count()
    sim.emb_lsh_pairs_from(warm, threshold=0.9).collect()
    warm.unpersist()

    for rpt in rpts:
        orig = sim.LSH_BANDED_ROWS_PER_TASK
        if rpt:
            sim.LSH_BANDED_ROWS_PER_TASK = rpt
        try:
            c0 = cpu_calibration_sec()
            jobs0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            rows = sim.emb_lsh_pairs_from(vecs, threshold=0.9).collect()
            wall = time.perf_counter() - t0
            c1 = cpu_calibration_sec()
            jobs = sorted(
                j for j in (tracker.getJobIdsForGroup(None) or []) if j not in jobs0
            )
            print(
                f"=== n={n} rows_per_task={rpt or orig} wall={wall:.1f}s "
                f"pairs={len(rows)} calib=({c0:.3f},{c1:.3f}) "
                f"wall_per_calib={wall / ((c0 + c1) / 2):.1f}"
            )
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if not ji:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si and si.numTasks:
                        print(
                            f"    job {j} stage {s}: tasks={si.numTasks} "
                            f"active={si.numActiveTasks} done={si.numCompletedTasks}"
                        )
        finally:
            sim.LSH_BANDED_ROWS_PER_TASK = orig
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Calib-bracketed A/B of curation_bench (full + base) — one process, N
samples, median + per-calib. Run once per code variant; compare medians.
Usage: python scripts/ab_curation.py [label] [n]
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

from columbiaimagesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "variant"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-curation")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as bench_mod
    from bench import cpu_calibration_sec

    from columbiaimagesearch_spark.operators.relational import a8_distinct

    a8_distinct(spark, sf_dir).count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    for full in (True, False):
        key = "curation_full" if full else "curation"
        bench_mod.curation_bench(spark, sf_dir, full=full)  # warm
        walls, ratios = [], []
        for _ in range(n):
            c0 = cpu_calibration_sec()
            w = bench_mod.curation_bench(spark, sf_dir, full=full)["seconds"]
            c1 = cpu_calibration_sec()
            walls.append(w)
            ratios.append(w / ((c0 + c1) / 2.0))
        print(
            f"[{label}] {key}: walls={['%.2f' % w for w in walls]} "
            f"med={statistics.median(walls):.3f} "
            f"med_per_calib={statistics.median(ratios):.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

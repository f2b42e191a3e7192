#!/usr/bin/env python
"""Headline-only bench loop for optimization iteration: same warm-up +
round-robin + median methodology as bench.py's query loop, none of the
extra sections. NOT the driver artifact — bench.py stays the contract.

Usage: python scripts/quick_bench.py [query ...]   (default: full HEADLINE)
Env: QUICK_N (default 3) timed rounds.
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

import bench  # noqa: E402
from columbiaimagesearch_spark import registry  # noqa: E402
from columbiaimagesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(bench.HEADLINE)
    n = int(os.environ.get("QUICK_N", "3"))
    spark = get_spark(app_name="quick-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    from columbiaimagesearch_spark.lopq.queries import fixture_model
    from columbiaimagesearch_spark.operators.ann_ivf import train_centroids
    from columbiaimagesearch_spark.operators.relational import a8_distinct

    a8_distinct(spark, sf_dir).count()
    spark.range(
        256, numPartitions=int(spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format(
        "noop"
    ).save()
    fixture_model(spark, sf_dir)
    train_centroids(spark, sf_dir)

    calib_pre = bench.cpu_calibration_sec()
    runs: dict[str, list[float]] = {name: [] for name in names}
    for timed in [False] + [True] * n:
        for name in names:
            start = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            if timed:
                runs[name].append(round(time.perf_counter() - start, 3))
    calib_post = bench.cpu_calibration_sec()
    meds = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    total = round(sum(meds.values()), 3)
    calib = (calib_pre + calib_post) / 2.0
    for k in sorted(meds, key=lambda k: -meds[k]):
        print(f"{meds[k]:8.3f}  {k}  {runs[k]}")
    print(
        f"TOTAL {total}  calib {calib_pre}/{calib_post}  "
        f"per_calib {round(total / calib, 2)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-eager-action attribution for the composed curation chain
(curation_full — VERDICT r16 next-round #2). curate_docs runs its verdict
stages as a SEQUENCE of eager actions (localCheckpoint pins, the
components toPandas, persisted-guard aggs); this wraps each eager seam
with a timing probe so the 7-8 s wall decomposes into named stages —
guide §1.1's "decide where the time goes" applied to a composed pipeline
instead of a single query.

Usage: python scripts/profile_curation.py [n_samples]   (idle host)
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from columbiaimagesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("profile-curation")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as bench_mod

    # Spark 4: instances are the CLASSIC DataFrame subclass — patching the
    # abstract pyspark.sql.DataFrame base is shadowed by the subclass
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older Spark: one concrete class
        from pyspark.sql import DataFrame

    # warm-up mirrors bench.py
    from columbiaimagesearch_spark.operators.relational import a8_distinct

    a8_distinct(spark, sf_dir).count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    events: list[tuple[str, float]] = []

    def _caller() -> str:
        for fr in reversed(traceback.extract_stack(limit=12)):
            if "columbiaimagesearch_spark" in fr.filename:
                return f"{Path(fr.filename).name}:{fr.lineno}"
        return "?"

    def _wrap(cls, meth):
        orig = getattr(cls, meth)

        def timed(self, *a, **kw):
            t0 = time.perf_counter()
            out = orig(self, *a, **kw)
            events.append((f"{meth} @ {_caller()}", time.perf_counter() - t0))
            return out

        setattr(cls, meth, timed)
        return orig

    origs = {m: _wrap(DataFrame, m) for m in ("localCheckpoint", "toPandas", "count", "collect")}
    try:
        bench_mod.curation_bench(spark, sf_dir, full=True)  # warm
        for i in range(n):
            events.clear()
            t0 = time.perf_counter()
            out = bench_mod.curation_bench(spark, sf_dir, full=True)
            wall = time.perf_counter() - t0
            print(f"--- sample {i}: wall={wall:.3f}s (bench secs={out['seconds']})")
            accounted = 0.0
            for name, sec in events:
                print(f"    {sec:7.3f}s  {name}")
                accounted += sec
            print(f"    {accounted:7.3f}s  accounted (rest = lazy-build + packed noop + count)")
    finally:
        for m, f in origs.items():
            setattr(DataFrame, m, f)
    spark.stop()


if __name__ == "__main__":
    main()

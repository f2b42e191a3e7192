"""SparkSession factory with cluster-shaped defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32), but every
conf here is chosen to also be the right default on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting — cell populations in the
  ANN index are Zipf-ish, cf. reference ``lopq/lopq/eval.py:66-74``).
- ``spark.sql.shuffle.partitions`` sized for the local tier; at 100 TB this
  becomes ~2-4x total cores and AQE coalesces down.
- Arrow enabled: all Python numerics cross the boundary as Arrow batches
  (pandas_udf / mapInPandas), never row-at-a-time pickling.
- Session timezone pinned to UTC so timestamp arithmetic is deterministic and
  matches the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Ship this package to the Python workers of ``spark``.

    The driver may import us by path from any cwd; executor Python workers
    unpickle our pandas-UDF closures *by reference* and need the package
    importable. ``addPyFile`` with a zip of the package makes that true for
    any session (local or cluster) without touching PYTHONPATH.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zpath = os.path.join(tempfile.gettempdir(), "columbiaimagesearch_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:  # noqa: BLE001 — already registered on this context
        pass
    _SHIPPED.add(key)


def get_spark(
    app_name: str = "columbiaimagesearch-spark",
    *,
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the tuned SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = int(
        shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

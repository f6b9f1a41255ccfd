"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` single-JVM; the config choices below are the
ones that matter on a real multi-executor cluster and are harmless locally:

* AQE on (runtime coalescing + skew-join splitting) — the north_rule calls
  for explicit skew handling; AQE is the safety net under our explicit
  salting (see operators/tf.py).
* Arrow enabled for pandas UDFs, with ``maxRecordsPerBatch`` tuned DOWN:
  Common-Crawl HTML blobs run 10s of KB to MBs, so the 10k-row default
  would balloon Python-worker memory; 512 rows/batch keeps a batch in the
  tens-of-MB range even for fat pages while still amortizing Arrow transfer.
* shuffle partitions default to a small multiple of cores locally; on a
  cluster you'd size this to ~2-3× total cores (or let AQE coalesce from a
  higher number).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for shipping to executors — the same artifact you
    would pass to ``spark-submit --py-files`` on a real cluster. Rebuilt on
    demand (the package is a few tens of KB)."""
    pkg_dir = pathlib.Path(__file__).resolve().parent
    zpath = os.path.join(tempfile.gettempdir(), "tribeca_insights_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, os.path.join(pkg_dir.name, p.relative_to(pkg_dir)))
    return zpath


def get_spark(
    app_name: str = "tribeca-insights-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 512,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(cpus) if cpus.isdigit() else 32
        shuffle_partitions = max(8, n)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Ship the package to Python workers — equivalent of --py-files; makes
    # pandas UDFs importable regardless of the driver's working directory.
    spark.sparkContext.addPyFile(package_zip())
    return spark

"""SparkSession factory.

One place for every engine-level knob so tests, the bench harness, the
driver entry point, and the pipelines all run with the same posture:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast selection) — the replacement for every hand-rolled
  batching/parallelism tactic in the reference (chunked reads, worker
  pools; cbddl/src/etl/pipeline.py:31,89-96).
- Arrow on for every pandas interchange (pandas_udf / applyInPandas /
  toPandas).
- Shuffle partitions sized to the local core count instead of the 200
  default; on a real cluster this is overridden per-job (AQE coalesces
  down from a high initial number, so err high there).
- Session timezone pinned to UTC so timestamp semantics are stable and
  comparable against external engines (DuckDB stores UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "chicago-business-owners-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test
    harness; on a cluster, leave it unset and let spark-submit decide.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Files >128MB split into tasks; at 100 TB this is the scan-side
        # parallelism knob together with the parquet row-group size.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

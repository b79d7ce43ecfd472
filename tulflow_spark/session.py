"""SparkSession factory tuned for this engine.

Defaults target the test/bench harness (``local[$SPARK_GRAFT_CPUS]``) but every
setting is chosen so the same plan scales to a large cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast demotion)
- Arrow on (pandas UDF / toPandas paths are vectorized)
- shuffle partitions sized to cores locally; on a real cluster AQE coalesces
  from a deliberately-high initial number, so we do not hand-pick per query.
- UTC session timezone so timestamp semantics match the DuckDB oracle and are
  environment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def shuffle_partitions() -> int:
    """Shuffle parallelism, scale-adaptive instead of a constant:
    defaults to the session's core count (so the harness's
    lower-core-count runs get proportionally fewer, larger partitions —
    guide §2.2) and is overridable via ``SPARK_GRAFT_SHUFFLE_PARTITIONS``
    for cluster deployments, where the right value is
    total-cores-to-a-few-times-total-cores with AQE coalescing from
    there."""
    return int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")) \
        or cpus()


DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Small files in the test corpus: don't explode task counts on tiny scans.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Keep broadcast threshold at default 10MB; dimension tables here are tiny
    # and at 100 TB the fact tables must never be broadcast anyway.
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    "spark.driver.memory": "8g",
    # Some driver parquet carries TIMESTAMP(NANOS) columns; set once at build
    # so io.table never has to mutate a live session's conf (io.py only
    # re-asserts it, idempotently, for foreign sessions like the driver's).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # PySpark 4 wraps every DataFrame API call in a Python stack walk to
    # attach call-site context to errors; on metadata-heavy paths (lake
    # DML: ~3k wrapped calls per operation) that is ~0.5-1 s of pure
    # driver CPU per query.  An engine favors throughput over Python
    # call-site decoration (JVM stacktraces remain intact).
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(
    app_name: str = "tulflow_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default tuning."""
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus()}]")
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions())
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

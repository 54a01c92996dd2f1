"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default local[*]); the
same config block is what we would ship to a 1000-executor cluster job —
AQE handles runtime re-planning (skew joins, partition coalescing), Arrow
handles the Python<->JVM boundary for the chunker UDF, and shuffle
partition count is set explicitly rather than left at the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "watsondedupe-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Notes on 100 TB posture: on a real cluster only ``master`` changes;
    shuffle partitions scale with input volume (AQE coalesces the excess),
    and ``files.maxPartitionBytes`` keeps scan tasks memory-bounded.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 8)

    # Python workers unpickle the chunker UDF by module reference, so the
    # package root must be importable in the worker processes regardless of
    # the driver's cwd. PYTHONPATH is inherited by locally-spawned workers;
    # on a cluster the same is done with --py-files / spark.submit.pyFiles.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver's parquet stores timestamps with isAdjustedToUTC=false,
        # which Spark 4 would otherwise infer as TIMESTAMP_NTZ — a type that
        # rejects unix_micros()/epoch arithmetic (DATATYPE_MISMATCH). The
        # session timezone is pinned UTC below, so reading them as ordinary
        # TIMESTAMP preserves the exact instants DuckDB's epoch_us() sees.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # deliberate defaults, A/B-measured at sf0.1: runtime Bloom
        # filter injection stays at its default ON (neutral here, wins
        # on large selective joins); parquet.aggregatePushdown stays at
        # its default OFF (a bench with it on cost ~0.3s/query in
        # planning with no bare-aggregate query to repay it)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table writes (sinks.write_bucketed) land here, not cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Parquet scans get predicate pushdown
    and column pruning from Catalyst for free.
    """
    if names is None:
        names = (
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        )
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out

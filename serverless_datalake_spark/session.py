"""SparkSession factory.

Defaults are chosen for correctness at small scale factors and sane
behavior at cluster scale:

* AQE on (runtime join-strategy selection, partition coalescing, skew
  join splitting) — replaces hand-tuning for the 100 TB target.
* ``spark.sql.shuffle.partitions`` sized from the env (local[32] box);
  on a real cluster AQE coalescing makes an over-provisioned number
  cheap, an under-provisioned one catastrophic, so we default high-ish
  and let AQE shrink.
* UTC session timezone so timestamp semantics match the DuckDB oracle.
* Arrow enabled — every Pandas-UDF operator in this repo rides it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "serverless-datalake-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract);
    on a real cluster the ``master`` setting would come from
    spark-submit and this factory only contributes SQL conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = (
        shuffle_partitions
        if shuffle_partitions is not None
        else int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
    )
    # Python workers must be able to import THIS package: pandas-UDF
    # closures (similarity/udf/multimodal operators) unpickle against
    # the module path. Workers spawn with the driver process env, NOT
    # the driver's sys.path, so a driver launched from any cwd other
    # than the repo root would hit ModuleNotFoundError in every UDF
    # stage. Local mode: prepend the repo root to PYTHONPATH before
    # the JVM forks workers. Cluster mode: ship a wheel / --py-files
    # (this env edit is a no-op there; the conf below still forwards).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Spark's default INT96 timestamps are a deprecated parquet
        # type that carries NO column statistics: every row-group
        # min/max skip and txlog zone map on an event-time column
        # silently never fires (found by the round-6 timestamp
        # zone-map test — zonemaps came back empty). TIMESTAMP_MICROS
        # is INT64-physical with full stats and is what every modern
        # writer (Delta, Iceberg, Trino) emits.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Long-lived sessions running hundreds of distinct queries fill
        # the JVM's JIT code cache with generated projection classes;
        # once full, compilation stops and HOF-heavy expressions fall
        # back to interpreted eval at 100-1000x cost (observed: a 6 s
        # query taking 25+ min after ~75 prior queries in one session).
        # Reserve a larger code cache and let flushing reclaim it.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        # the fixtures store TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()

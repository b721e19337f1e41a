"""SparkSession factory with the engine's standard configuration.

Tuned for local[N] testing but written for multi-executor clusters:
AQE on (runtime re-plan + skew-join splitting), Arrow transport for the
pandas-UDF kernels, UTC session timezone so timestamp arithmetic is
oracle-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go_matrixprofile_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 2) * 2
    # one BLAS thread per python worker: N workers × M BLAS threads
    # oversubscribes the node 32x and collapses kernel throughput
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(master)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce INSIDE cached plans too (off by default to
        # preserve cached output partitioning): without it a persisted
        # tier keeps every raw shuffle partition and downstream
        # aggregations schedule hundreds of near-empty tasks — measured
        # 2× on tier-on-tier rollups over a cached tier. Stages that
        # genuinely need a pinned width (CPU-heavy kernels) use explicit
        # numbered repartitions, which AQE never coalesces.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_up(spark)
    return spark


def _warm_up(spark: SparkSession) -> None:
    """Absorb one-time session start-up costs at CREATION time: JIT and
    whole-stage-codegen compiler warm-up, shuffle machinery init, and
    the fork of the Python/Arrow worker pool. Without this the first
    real query of every session pays ~3-6 s of infrastructure cost that
    has nothing to do with the query — misleading in benchmarks and
    wasted on the critical path of short jobs. Runs tiny synthetic jobs
    only (spark.range): no input data is read, nothing is cached, no
    result is retained. Disable with SPARK_GRAFT_NO_WARMUP=1."""
    if os.environ.get("SPARK_GRAFT_NO_WARMUP") == "1":
        return
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        # one shuffle + aggregation job: initializes the shuffle system,
        # exchange codegen, and AQE machinery
        spark.range(0, 1000, 1, 8).groupBy((F.col("id") % 7).alias("k")).count().count()

        # one Arrow/pandas job: forks the Python worker pool and warms
        # the Arrow serialization path used by the kernel stages
        def _noop_batches(it):
            for pdf in it:
                yield pdf

        spark.range(0, 64, 1, 8).mapInPandas(_noop_batches, "id long").count()
    except Exception:
        # warm-up is best-effort: a failure here must never break
        # session creation (e.g. minimal builds without pandas/Arrow)
        pass

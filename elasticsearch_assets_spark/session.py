"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: every config here
is one that carries to cluster mode (AQE, shuffle partitions, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elasticsearch_assets_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    cpus defaults to $SPARK_GRAFT_CPUS or 32 (the sandbox allocation).
    shuffle_partitions defaults to cpus — at cluster scale you would set
    this to ~2-3x total cores or rely on AQE coalescing, which is enabled.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # shuffle spill dir: tmpfs when available — local shuffle I/O
    # otherwise serializes on one disk and caps multi-core scaling
    # (cluster equivalent: per-node local SSDs, which scale with nodes)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's default 64 MB advisory size coalesces bench-scale shuffles
        # down to a handful of partitions, serializing CPU-bound stages.
        # 8 MB keeps all cores busy locally; on a real cluster raise it
        # back via SPARK_ADVISORY_MB (partition count stays huge at 100 TB
        # either way).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            f"{int(os.environ.get('SPARK_ADVISORY_MB', '8'))}m",
        )
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Local mode runs every task inside the driver JVM, so this IS
        # the executor heap. 16g was enough for the sf0.1 bench corpus
        # but GC-thrashed (2x slower, high run-to-run variance) on the
        # 5x build probe; 48g restores stable, better-than-linear
        # throughput. Cluster equivalent: spark.executor.memory sized so
        # a shuffle partition's sort buffer fits (~per-core share here).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # orderBy+limit(k) compiles to TakeOrderedAndProject, whose
        # Guava TopKSelector PRE-allocates a 2k-element buffer in every
        # task — at the Spark default threshold (Int.MaxValue) a
        # "give me everything" k like 10^9 allocates ~16 GB per scan
        # partition and OOMs the executor (observed: 8-task broadcast
        # plan × 16 GB on a 400-doc corpus). 100k keeps every real
        # serving k (10..10_000) on the per-partition-heap fast path
        # and falls back to sort+GlobalLimit above it — the same guard
        # an executor needs at 100 TB.
        .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

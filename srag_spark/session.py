"""SparkSession factory with scale-oriented defaults.

The session settings here are the ones that matter at 100 TB just as much
as at test scale: AQE on (runtime shuffle-partition coalescing + skew-join
splitting), Arrow transport for every pandas UDF, LAST_WIN map-key dedup
(the reference's right-biased ``metadata ++ extra`` merge semantics,
srag-domain Transcript.scala:17-21), and a bounded broadcast threshold so
small dimension/query-side relations broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "srag-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    On a real cluster this function is still correct: pass master=None and
    let spark-submit supply the master; every other conf is cluster-safe.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else 32
    # driver memory: in local mode the driver JVM IS the executor, so
    # heap must scale with concurrent tasks — same 0.75 GiB/core formula
    # bench.py's scaling children use (r5's sf1 run crashed Python
    # workers under an 8g heap at 32 cores).  SPARK_GRAFT_DRIVER_MEM
    # overrides; on a real cluster executor memory is provisioned by
    # spark-submit and this value only sizes the (thin) driver.
    cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
    cores_guess = int(cpus_s) if cpus_s.isdigit() else (os.cpu_count() or 8)
    default_mem = f"{max(8, (cores_guess * 3) // 4)}g"
    # scan split size: 32 MB keeps a handful-of-files local dataset from
    # serializing its scans (128 MB splits put a 6 M-row table on 1-2
    # tasks) while staying far above per-task overhead; raise via env on
    # clusters doing huge sequential scans (guide §6)
    max_part_bytes = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle sizing ------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- pandas/Arrow UDF path -----------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2000-doc Arrow batches: big enough to amortize the JVM↔Python
        # round-trip, small enough to pipeline and stay cache-resident
        # (10k-doc batches measurably increase kernel/page-fault time)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        # --- semantics ------------------------------------------------------
        # right-biased map merge: reference Transcript.addMetadatas (`++`)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.session.timeZone", "UTC")
        # --- broadcast small sides ------------------------------------------
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # quieter local runs
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", default_mem))
        .config("spark.sql.files.maxPartitionBytes", max_part_bytes)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

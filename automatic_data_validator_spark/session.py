"""SparkSession factory tuned for the sandbox (local[N]) while keeping
cluster-correct defaults: AQE on, Arrow on, shuffle partitions sized to
parallelism (not the 200 default), UTC timestamps.

This is the LOCAL harness helper (tests/bench): it pins
master=local[N] unless a master is already configured (spark-submit
sets spark.master, which must win — a hardcoded local master would
silently run a cluster job driver-only). Cluster entry points
(jobs/validate_job.py, the emitted pipeline runner) use the plain
builder and inherit everything from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _mem_mb(size: str) -> int:
    """JVM memory string ('48g', '4096m', plain bytes) -> whole MB."""
    s = size.strip().lower()
    mult = {"k": 1 / 1024, "m": 1, "g": 1024, "t": 1024 * 1024}
    if s and s[-1] in mult:
        return max(int(float(s[:-1]) * mult[s[-1]]), 1)
    return max(int(s) // (1024 * 1024), 1)


def get_spark(
    app_name: str = "automatic_data_validator_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local core count; defaults to $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to max(parallelism, 32) — at cluster
    scale this is set per-job via spark-submit; AQE coalesces down.
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 32)
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    builder = SparkSession.builder
    # Respect an externally-provided master. PYSPARK_SUBMIT_ARGS alone
    # is NOT a reliable signal: spark-submit launches the python driver
    # attached to an ALREADY-RUNNING JVM (PYSPARK_GATEWAY_PORT) whose
    # system properties carry the submitted spark.master — the env var
    # is only set for gateway-launching (pyspark-shell style) runs. So
    # check, in order: an active session, an attached submit gateway,
    # the env var, and finally the JVM-reflecting SparkConf (round-2
    # ADVICE: the old check silently ran `--master yarn` jobs
    # driver-only under local[N]).
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    master_configured = (
        SparkSession.getActiveSession() is not None
        or bool(os.environ.get("PYSPARK_GATEWAY_PORT"))
        or "--master" in submit_args
        or "spark.master" in submit_args
    )
    if not master_configured:
        try:
            from pyspark import SparkConf

            master_configured = SparkConf(loadDefaults=True).contains("spark.master")
        except Exception:
            master_configured = False
    if not master_configured:
        builder = builder.master(f"local[{parallelism}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
        # status-store stage retention: the scan-count guard reads
        # cumulative per-stage input metrics; default eviction (1000)
        # would silently shrink deltas in long sessions
        .config("spark.ui.retainedStages", "100000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Scan-parallelism floor for small inputs (guide §2/§6): Spark
        # sizes splits as min(maxPartitionBytes, max(openCostInBytes,
        # totalBytes/defaultParallelism)) — the 4MB openCost default
        # (sized for spinning disks) floors the split size, so a 6-25MB
        # table scans in 2-7 tasks on 32 cores and every downstream
        # per-row operator (Arrow UDF signing included) runs at 1/5th
        # the machine. 256KB matches NVMe/object-store open cost;
        # LARGE inputs are unaffected (totalBytes/parallelism then
        # dominates the max, capped by maxPartitionBytes as before) —
        # i.e. the change is scale-adaptive by construction, not a
        # local[32] constant. Parameterized for cluster profiles.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "262144"),
        )
        # Throughput GC: at high local thread counts the default G1
        # collector serializes allocation-heavy operators (nested-array
        # scans, HLL over structs) — measured 8x slower at local[32].
        # ParallelGC restores near-linear scaling for this workload.
        # The driver heap is PRE-SIZED (-Xms = -Xmx, young gen = 1/3):
        # ParallelGC's adaptive sizing otherwise starts small and grows
        # the heap across the first jobs, and every expansion round
        # costs allocation-failure pauses — measured as the first
        # identical e2e trial running 1.5-2x the steady state
        # (13.3/8.9/6.3 s -> 8.6/5.4/5.1 s with pre-sizing). Standard
        # dedicated-host practice; derived from the configured driver
        # memory, so a smaller $SPARK_DRIVER_MEM scales it down.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC "
            f"-Xms{_mem_mb(driver_mem)}m -Xmn{_mem_mb(driver_mem) // 3}m",
        )
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

"""Plan/metrics introspection helpers shared by bench + tests.

The AppStatusStore input-records counter is the repo's standard way of
pinning "how many times was the input scanned" properties (fused
single-pass profiling, incremental scan budgets, the dedup pipeline's
one-pass signature contract). The py4j ``stageList$default$`` default-
argument incantation is Spark-version-fragile, so it lives in exactly
one place.
"""

from __future__ import annotations


def input_records(spark) -> int:
    """Cumulative records read from input sources across all COMPLETED
    stages (AppStatusStore). Take a snapshot before a job and diff
    after; delta / input rows = number of input scans. Only finished
    stages are counted, so call after an action has returned."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark._jvm.java.util.Collections.emptyList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *args)
    return sum(stages.apply(i).inputRecords() for i in range(stages.size()))

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
    import time

    sc = spark.sparkContext._jsc.sc()
    try:
        # the status store is fed by an ASYNC listener bus: under host
        # load, stage metrics can lag the action's return by seconds,
        # silently under-counting a snapshot (observed as a scan-budget
        # test false-failing only during a concurrent full-suite run).
        # Drain the bus before reading; best-effort — the counter is
        # still meaningful without it, just eventually consistent.
        sc.listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass

    def _read() -> int:
        store = sc.statusStore()
        empty = spark._jvm.java.util.Collections.emptyList()
        args = [
            getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
        ]
        stages = store.stageList(empty, *args)
        return sum(
            stages.apply(i).inputRecords() for i in range(stages.size())
        )

    # waitUntilEmpty can time out silently (it returns a bool this
    # ignores), and a stage completing between a caller's before/after
    # snapshots mis-attributes its records to the measured delta —
    # observed as order-dependent flakes in the scan-budget tests.
    # Quiesce: re-read until two consecutive snapshots agree.
    prev = _read()
    for _ in range(20):
        time.sleep(0.1)
        cur = _read()
        if cur == prev:
            return cur
        prev = cur
    return prev


def _stage_rows(spark) -> "dict[int, int]":
    """{stageId: inputRecords} for all completed stages in the store."""
    sc = spark.sparkContext._jsc.sc()
    store = sc.statusStore()
    empty = spark._jvm.java.util.Collections.emptyList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *args)
    return {
        stages.apply(i).stageId(): stages.apply(i).inputRecords()
        for i in range(stages.size())
    }


def scan_records(spark, action) -> int:
    """Run ``action()`` and return the input records read by the
    stages IT submitted — scoped by stage id, so a straggler stage
    from earlier work completing mid-measurement (or a store eviction)
    cannot pollute the figure the way a global-sum before/after diff
    can. Use this for scan-budget assertions in long shared sessions;
    ``input_records`` diffs remain fine for one-shot scripts."""
    import time

    sc = spark.sparkContext._jsc.sc()
    try:
        sc.listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass
    before = _stage_rows(spark)
    max_before = max(before, default=-1)
    action()
    try:
        sc.listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass
    prev = None
    for _ in range(20):
        cur = _stage_rows(spark)
        new = sum(v for k, v in cur.items() if k > max_before)
        if new == prev:
            break
        prev = new
        time.sleep(0.1)
    # prev holds the LATEST reading here (converged or not); a genuine
    # zero-record scan must come back as 0, never be conflated with
    # "no reading" (round-5 ADVICE)
    return 0 if prev is None else prev

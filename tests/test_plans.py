"""Physical-plan shape guards: the properties PLANS.md documents must
survive refactors — pushdown reaching the scan, broadcast vs
sort-merge selection, salted two-phase aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from automatic_data_validator_spark import dedup as D


def _final_plan(df) -> str:
    df.count()  # finalize AQE so the executed plan is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_reaches_parquet(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 3 referenced columns in ReadSchema
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_quantity" not in read_schema


def test_uniqueness_join_strategy_by_dup_set_size(spark, docs):
    # cached violations from OTHER tests would be plan-matched here
    # (cache lookup ignores join hints), so start from a clean cache;
    # DataFrames with a set storage level re-cache on next action
    spark.catalog.clearCache()
    _, viol_b = D.uniqueness_check(docs, "doc_id")
    p = _final_plan(viol_b)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # unpersist first: Spark's cache lookup canonicalizes away join
    # hints, so the fallback variant would silently reuse this cache
    viol_b.unpersist()
    _, viol_s = D.uniqueness_check(docs, "doc_id", broadcast_limit=0)
    p2 = _final_plan(viol_s)
    assert "SortMergeJoin" in p2 and "BroadcastHashJoin" not in p2


def test_two_phase_salted_aggregation_shape(spark, docs):
    dups = D.duplicate_key_counts(docs, "doc_id")
    plan = _final_plan(dups)
    # phase 1 exchange keyed (doc_id, _salt), phase 2 keyed doc_id only
    assert "hashpartitioning(doc_id" in plan
    assert "_salt" in plan

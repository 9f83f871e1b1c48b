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


def test_uniqueness_violations_single_scan(spark, tmp_path):
    """The uniqueness check reads the fact table EXACTLY ONCE: phase 1
    aggregates by (key, partition_id) — the physical partition doubles
    as skew salt and attribution — and phase 2 is a window over the
    aggregated rows, so the former second attribution scan is gone
    (round-2 directive #1/#6)."""
    from automatic_data_validator_spark.synth import make_documents

    path = str(tmp_path / "uniq_docs")
    make_documents(spark, 5_000, n_media=200, seed=7).write.parquet(path)
    docs = spark.read.parquet(path)
    _, viol = D.uniqueness_check(docs, "doc_id")
    viol.unpersist()  # drop the cache wrapper so the raw plan shows
    p = _final_plan(viol).split("== Initial Plan ==")[0]
    assert p.count("FileScan parquet") == 1
    # no join anywhere: attribution comes from the aggregate itself
    assert "Join" not in p
    # both exchanges present: (doc_id, partition_id) then doc_id only
    assert "hashpartitioning(doc_id" in p and "partition_id" in p


def test_two_phase_salted_aggregation_shape(spark, docs):
    dups = D.duplicate_key_counts(docs, "doc_id")
    plan = _final_plan(dups)
    # phase 1 exchange keyed (doc_id, _salt), phase 2 keyed doc_id only
    assert "hashpartitioning(doc_id" in plan
    assert "_salt" in plan

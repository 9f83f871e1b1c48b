"""Edge inputs: empty tables, extreme skew, single row."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from automatic_data_validator_spark import rules as R
from automatic_data_validator_spark.dedup import duplicate_key_counts
from automatic_data_validator_spark.profile import profile
from automatic_data_validator_spark.synth import DOCUMENTS_SCHEMA
from automatic_data_validator_spark.validate import run_validation


def test_empty_documents_table(spark):
    empty = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    res = run_validation(spark, empty, with_profile=True)
    assert res.violations.count() == 0
    assert res.verdicts.filter(~F.col("pass")).count() == 0
    p = profile(empty)
    assert p.row_count == 0
    assert p.stats["doc_id"]["non_null_count"] == 0


def test_single_row(spark):
    one = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}])],
        DOCUMENTS_SCHEMA,
    )
    res = run_validation(spark, one, with_profile=False)
    assert res.violations.count() == 0
    assert res.passed()


def test_extreme_skew_dedup_correct(spark):
    # one key carries 30% of all rows — the salted two-phase path must
    # still produce exact counts
    n = 50_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("doc_id")
    )
    got = {r["doc_id"]: r["dup_count"] for r in duplicate_key_counts(df, "doc_id").collect()}
    assert got == {"HOT": 15_000}


def test_rules_on_all_null_column(spark):
    pdf = pd.DataFrame({"doc_id": [None, None, None]})
    df = spark.createDataFrame(pdf.astype(object))
    v, x = R.evaluate_row_rules(
        df, [R.Rule("nn", "not_null", column="doc_id")]
    )
    assert x.count() == 3
    total = v.agg(F.sum("violation_count")).collect()[0][0]
    assert total == 3

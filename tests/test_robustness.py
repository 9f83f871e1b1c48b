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


def test_uniqueness_on_single_key_table(spark):
    """Degenerate skew: EVERY row shares one key. The salted two-phase
    agg must not funnel to one reducer and counts stay exact."""
    from automatic_data_validator_spark.dedup import uniqueness_check

    df = spark.range(40_000).select(F.lit("the-one-key").alias("doc_id"))
    verdicts, violations = uniqueness_check(df, "doc_id")
    assert violations.count() == 40_000
    assert verdicts.agg(F.sum("violation_count")).collect()[0][0] == 40_000


def test_span_rules_on_huge_span_arrays(spark):
    """1k-span docs: the lambda-free order predicate and the Arrow
    normalizer must handle wide arrays without quadratic behavior."""
    from automatic_data_validator_spark import rules as RR
    from automatic_data_validator_spark.spans import normalize_spans_arrow

    docs = spark.range(200).select(
        F.format_string("d%04d", F.col("id")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(999)),
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("w  ord "), i.cast("string")).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    v, _ = RR.evaluate_row_rules(
        docs, [RR.Rule("span_order", "span_order", column="spans")]
    )
    assert v.agg(F.sum("violation_count")).collect()[0][0] == 0
    out = normalize_spans_arrow(docs)
    row = out.filter(F.col("doc_id") == "d0000").collect()[0]
    assert len(row["spans"]) == 1000
    assert row["spans"][5]["text"] == "w ord 5"


def test_profile_on_wide_table(spark):
    """100-column frame: the fused agg stays one pass and returns a
    stat block per column."""
    from automatic_data_validator_spark.profile import profile

    cols = {f"c{i:03d}": F.pmod(F.col("id") * (i + 7), F.lit(97)).cast("double")
            for i in range(100)}
    df = spark.range(2_000).select(*[v.alias(k) for k, v in cols.items()])
    p = profile(df, detect_formats=False)
    assert p.row_count == 2_000
    assert len(p.stats) == 100
    assert all("mean" in st for st in p.stats.values())

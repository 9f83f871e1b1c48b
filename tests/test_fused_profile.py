"""Fused rules+profile scan (round-2 VERDICT directive #1).

The profiler's algebraic statistics ride the row-rules per-partition
aggregate; globals are reconstructed from per-partition partials
(Pébay-merged central moments, HLL sketch unions, exact sum/min/max
merges). These tests pin (a) statistic equivalence vs the classic
single-agg profile, (b) edge-case moment semantics, and (c) the actual
IO saving: a fused end-to-end run reads strictly fewer input bytes than
the classic one, and stays under the 4-scan budget."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from automatic_data_validator_spark.profile import (
    profile,
    profile_partitioned,
)
from automatic_data_validator_spark.validate import run_validation


def _close(a, b, rtol=1e-6):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= rtol * max(abs(a), abs(b), 1e-12)
    return a == b


def _mixed_frame(spark):
    """All profiled dtypes + pathological columns: nulls, constants,
    a single-value column, an all-null column, negatives, skew."""
    return spark.range(0, 10_000, 1, 6).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("small_int"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.pow(F.col("id") % 100, F.lit(2.0)) - 50)
        .alias("skewed_dbl"),
        F.lit(3.25).alias("const_dbl"),
        F.lit(None).cast("double").alias("all_null"),
        F.when(F.col("id") % 3 == 0, F.lit("apple pie"))
        .when(F.col("id") % 3 == 1, F.lit("1234"))
        .otherwise(F.lit("UPPER!"))
        .alias("s"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 2 == 0))
        .alias("b"),
        F.to_timestamp(F.lit("2023-01-01 00:00:00")).alias("ts"),
        F.array(F.col("id").cast("string"), F.lit("x")).alias("arr"),
    )


def test_partitioned_profile_matches_classic(spark):
    df = _mixed_frame(spark)
    classic = profile(df, detect_formats=False)
    fused = profile_partitioned(df, detect_formats=False)
    assert fused.row_count == classic.row_count
    for c, st in classic.stats.items():
        for m, v in st.items():
            got = fused.stats.get(c, {}).get(m, "MISSING")
            if m == "distinct_count":
                # HLL-union sketch vs approx_count_distinct: both are
                # estimates; they must agree within combined error
                assert got != "MISSING" and _close(got, v, rtol=0.2), (c, m, v, got)
            elif m in ("q1", "median", "q3"):
                assert _close(got, v, rtol=0.05), (c, m, v, got)
            else:
                assert _close(got, v, rtol=1e-6), (c, m, v, got)
    # no extra metrics invented either
    extra = {
        (c, m)
        for c, st in fused.stats.items()
        for m in st
        if m not in classic.stats.get(c, {})
    }
    assert not extra


def test_partitioned_profile_suggestions_match(spark):
    df = _mixed_frame(spark)
    classic = profile(df, detect_formats=False)
    fused = profile_partitioned(df, detect_formats=False)
    for c, sug in classic.suggestions.items():
        fsug = fused.suggestions[c]
        for k in ("null_count", "is_categorical", "suggested_dtype", "dtype"):
            if k == "is_categorical" or k == "suggested_dtype":
                # derived from the approximate distinct count — equal
                # here because the cardinalities are far from threshold
                assert fsug[k] == sug[k], (c, k)
            else:
                assert fsug[k] == sug[k], (c, k)


def test_moment_merge_edge_partitions(spark):
    """Single-row partitions, constant columns, empty-after-filter
    partitions: the Pébay merge must reproduce Spark's own
    stddev/skewness/kurtosis semantics including NaN/null edges."""
    df = spark.range(0, 5, 1, 5).select(  # five 1-row partitions
        (F.col("id") * 1.5).alias("x"),
        F.lit(2.0).alias("c"),
    )
    classic = profile(df, detect_formats=False)
    fused = profile_partitioned(df, detect_formats=False)
    for col in ("x", "c"):
        for m in ("mean", "std", "skewness", "kurtosis", "min", "max"):
            assert _close(
                fused.stats[col].get(m), classic.stats[col].get(m), rtol=1e-9
            ), (col, m, classic.stats[col].get(m), fused.stats[col].get(m))
    one = spark.range(1).select(F.lit(7.0).alias("x"))
    cf, ff = profile(one), profile_partitioned(one)
    assert ff.stats["x"]["std"] is None and cf.stats["x"]["std"] is None
    assert ff.stats["x"]["mean"] == 7.0


def test_run_validation_fused_metrics_match_classic(spark, docs, catalog):
    fused = run_validation(spark, docs, catalog=catalog, with_profile=True)
    classic = run_validation(
        spark, docs, catalog=catalog, with_profile=True, fused_profile=False
    )
    fm = {(r["column"], r["metric"]): r["value"] for r in fused.metrics.collect()}
    cm = {(r["column"], r["metric"]): r["value"] for r in classic.metrics.collect()}
    assert set(fm) == set(cm)
    for k, v in cm.items():
        rtol = 0.2 if k[1] == "distinct_count" else 1e-6
        assert _close(fm[k], v, rtol=rtol), (k, v, fm[k])
    # verdicts identical regardless of profile mode
    assert sorted(map(tuple, fused.verdicts.collect())) == sorted(
        map(tuple, classic.verdicts.collect())
    )


from automatic_data_validator_spark.introspect import (
    input_records as _input_records,
)


@pytest.fixture()
def parquet_docs(spark, tmp_path_factory):
    from automatic_data_validator_spark.synth import (
        make_documents,
        make_media_catalog,
    )

    base = tmp_path_factory.mktemp("fused_io")
    make_documents(spark, 30_000, n_media=500, seed=11).write.parquet(
        str(base / "docs")
    )
    make_media_catalog(spark, 500, seed=11).write.parquet(str(base / "cat"))
    return base


def test_fused_run_cuts_input_scans(spark, parquet_docs):
    """The scan-count assertion behind 'cut ~6 scans to 4' (round-2
    directive #1): a full validation run — materializing every output,
    as bench does — reads the input table 4 times (fused rules+profile
    scan, row-rules violation scan, single-scan uniqueness,
    referential), measured at 4.03 passes (vs 5.03 classic-profile,
    vs ~6 in round 2 before the uniqueness redesign), and the fused
    profile must save a full pass vs the classic run on the same
    input."""
    n_docs = 30_000
    docs_path = str(parquet_docs / "docs")

    def run_once(fused: bool) -> int:
        spark.catalog.clearCache()  # identical plans would cache-hit
        docs = spark.read.parquet(docs_path)
        catalog = spark.read.parquet(str(parquet_docs / "cat"))
        r0 = _input_records(spark)
        res = run_validation(
            spark, docs, catalog=catalog, with_profile=True, fused_profile=fused
        )
        # materialize everything a production run writes
        res.violations.count()
        res.verdicts.count()
        res.metrics.count()
        return _input_records(spark) - r0

    classic = run_once(False)
    fused = run_once(True)
    # the fused run saves the profiler's full pass (>= ~0.9 scans;
    # cache-read slack for the small persisted violation frames)
    assert fused <= classic - 0.9 * n_docs, (fused, classic)
    # absolute budget — scans, not bytes: the catalog (500 rows) and
    # cached small frames contribute the fractional slack over 4.0
    assert fused <= 4.4 * n_docs, (fused / n_docs,)


def test_fused_leaves_no_cache_entries(spark, docs, catalog):
    spark.catalog.clearCache()
    docs.cache().count()
    jsc = spark.sparkContext._jsc.sc()
    # DELTA assertion: earlier tests in the shared session may leave
    # localCheckpoint blocks (they clear on GC, not clearCache)
    before = jsc.getPersistentRDDs().size()
    res = run_validation(spark, docs, catalog=catalog, with_profile=True)
    res.violations.count()
    res.metrics.count()
    n = jsc.getPersistentRDDs().size() - before
    # at most the three small persisted violation frames added (r6:
    # the row-rules violations are localCheckpoint'ed during the run
    # so the caller's write does not re-scan the input)
    assert n <= 3, n


def test_fused_run_with_numeric_columns_adds_quantile_pass(spark):
    """Generic tables with numeric columns go through the fused scan
    PLUS the column-pruned quantile pass; metrics must still match the
    classic profile."""
    import pyspark.sql.functions as F2

    from automatic_data_validator_spark import rules as R

    df = spark.range(0, 20_000, 1, 8).select(
        F2.concat(F2.lit("k"), F2.col("id")).alias("key"),
        (F2.col("id") % 97).cast("double").alias("val"),
        F2.when(F2.col("id") % 11 == 0, None)
        .otherwise(F2.col("id") % 5)
        .cast("int")
        .alias("cat"),
    )
    rules = [
        R.Rule("nn_key", "not_null", column="key"),
        R.Rule("val_range", "range", column="val", params={"min": 0, "max": 100}),
    ]
    fused = run_validation(spark, df, rule_set=rules, key_column="key",
                           check_uniqueness=False, with_profile=True)
    classic = run_validation(spark, df, rule_set=rules, key_column="key",
                             check_uniqueness=False, with_profile=True,
                             fused_profile=False)
    fm = {(r["column"], r["metric"]): r["value"] for r in fused.metrics.collect()}
    cm = {(r["column"], r["metric"]): r["value"] for r in classic.metrics.collect()}
    assert set(fm) == set(cm)
    # quantiles present and matching (the pruned extra pass ran)
    for c in ("val", "cat"):
        for m in ("q1", "median", "q3"):
            assert (c, m) in fm
            assert _close(fm[(c, m)], cm[(c, m)], rtol=0.05), (c, m)
    for k, v in cm.items():
        rtol = 0.2 if k[1] == "distinct_count" else (
            0.05 if k[1] in ("q1", "median", "q3") else 1e-6
        )
        assert _close(fm[k], v, rtol=rtol), (k, v, fm[k])


def test_fused_profile_in_spill_mode_matches_default(spark, docs, catalog):
    """Spill mode (distributed verdicts, 8M-partition path) must
    produce the same fused-profile metrics and verdicts as the default
    driver-collected path."""
    base = run_validation(spark, docs, catalog=catalog, with_profile=True)
    spilled = run_validation(
        spark, docs, catalog=catalog, with_profile=True,
        verdict_spill_threshold=1,
    )
    bm = {(r["column"], r["metric"]): r["value"] for r in base.metrics.collect()}
    sm = {(r["column"], r["metric"]): r["value"] for r in spilled.metrics.collect()}
    assert set(bm) == set(sm)
    for k, v in bm.items():
        assert _close(sm[k], v, rtol=1e-9), (k, v, sm[k])
    assert sorted(map(tuple, base.verdicts.collect())) == sorted(
        map(tuple, spilled.verdicts.collect())
    )


def test_fused_quantiles_match_approx_within_tolerance(spark):
    """quantile_impl='fused' (round-3 VERDICT directive #10): grid-
    merged q1/median/q3 must track the default percentile_approx pass
    within the documented grid-step tolerance, and every non-quantile
    metric must be identical to the default fused path."""
    df = _mixed_frame(spark)
    approx = profile_partitioned(df, detect_formats=False)
    fused = profile_partitioned(df, detect_formats=False, quantile_impl="fused")
    for c, st in approx.stats.items():
        for m, v in st.items():
            got = fused.stats.get(c, {}).get(m, "MISSING")
            if m in ("q1", "median", "q3"):
                if v is None:
                    assert got is None, (c, m, got)
                else:
                    # grid rank error ≲ 1/32 within a partition: allow
                    # 5% of the column's value range
                    rng = (approx.stats[c]["max"] or 0) - (
                        approx.stats[c]["min"] or 0
                    )
                    assert got != "MISSING" and got is not None, (c, m)
                    assert abs(got - v) <= max(0.05 * rng, 1e-9), (c, m, v, got)
            elif m == "distinct_count":
                assert _close(got, v, rtol=0.2), (c, m, v, got)
            else:
                assert _close(got, v, rtol=1e-6), (c, m, v, got)
    assert fused.stats["all_null"]["median"] is None


def test_fused_quantiles_single_input_pass(spark, tmp_path_factory):
    """The point of the opt-in: a numeric table profiles in ONE input
    pass under quantile_impl='fused' (vs two with the default separate
    quantile pass)."""
    base = tmp_path_factory.mktemp("fusedq")
    n = 30_000
    spark.range(0, n, 1, 8).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") % 101).cast("double").alias("b"),
    ).write.parquet(str(base / "t"))

    def passes(quantile_impl: str) -> float:
        spark.catalog.clearCache()
        df = spark.read.parquet(str(base / "t"))
        r0 = _input_records(spark)
        profile_partitioned(df, detect_formats=False, quantile_impl=quantile_impl)
        return (_input_records(spark) - r0) / n

    assert passes("approx") >= 1.8
    assert passes("fused") <= 1.2


def test_run_validation_fused_quantile_impl(spark):
    """run_validation(quantile_impl='fused') on a numeric table: same
    metric keys as the default, quantiles within tolerance, and no
    separate quantile job needed."""
    df = spark.range(0, 10_000, 1, 6).select(
        F.concat(F.lit("k"), F.col("id")).alias("doc_id"),
        (F.col("id") % 97).cast("double").alias("val"),
    )
    from automatic_data_validator_spark import rules as R

    rs = [R.Rule("nn_doc", "not_null", column="doc_id")]  # enables fusion
    default = run_validation(
        spark, df, rule_set=rs, check_uniqueness=False, with_profile=True
    )
    fused = run_validation(
        spark, df, rule_set=rs, check_uniqueness=False, with_profile=True,
        quantile_impl="fused",
    )
    dm = {(r["column"], r["metric"]): r["value"] for r in default.metrics.collect()}
    fm = {(r["column"], r["metric"]): r["value"] for r in fused.metrics.collect()}
    assert set(dm) == set(fm)
    for m in ("q1", "median", "q3"):
        assert abs(fm[("val", m)] - dm[("val", m)]) <= 5.0, (m, dm[("val", m)], fm[("val", m)])

"""Profiler vs pandas oracle using the reference's exact formulas and
thresholds (config.py:43,56-58; schema_manager.py:41-143)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from automatic_data_validator_spark import config
from automatic_data_validator_spark.profile import profile, quality_report


@pytest.fixture(scope="module")
def wide(spark):
    rng = np.random.RandomState(42)
    n = 2000
    pdf = pd.DataFrame(
        {
            "num_normal": rng.normal(10, 2, n),
            "num_outliers": np.concatenate([rng.normal(0, 1, n - 20), rng.normal(0, 1, 20) + 50]),
            "num_as_string": [str(i) for i in range(n)],
            "int_like_float": rng.randint(0, 5, n).astype(float),
            "date_iso": pd.date_range("2020-01-01", periods=n).strftime("%Y-%m-%d"),
            "cat_low_card": rng.choice(["a", "b", "c"], n),
            "mostly_null": [None if i % 10 else "x" for i in range(n)],
            "free_text": ["hello world " + ("ALLCAPS" if i % 7 == 0 else "text123") for i in range(n)],
            "bool_col": rng.choice([True, False], n),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_fused_profile_matches_pandas(spark, wide):
    pdf, df = wide
    p = profile(df, exact_distinct=True)
    assert p.row_count == len(pdf)

    st = p.stats["num_normal"]
    assert st["non_null_count"] == pdf["num_normal"].notna().sum()
    assert math.isclose(st["mean"], pdf["num_normal"].mean(), rel_tol=1e-9)
    assert math.isclose(st["std"], pdf["num_normal"].std(ddof=1), rel_tol=1e-9)
    assert math.isclose(st["min"], pdf["num_normal"].min(), rel_tol=1e-12)
    assert math.isclose(st["max"], pdf["num_normal"].max(), rel_tol=1e-12)
    # percentile_approx at accuracy 10k on 2k rows is exact-rank
    assert abs(st["median"] - pdf["num_normal"].median()) < 0.02
    assert math.isclose(st["skewness"], pdf["num_normal"].skew(), abs_tol=0.01)
    assert math.isclose(st["kurtosis"], pdf["num_normal"].kurtosis(), abs_tol=0.05)

    assert p.stats["mostly_null"]["non_null_count"] == pdf["mostly_null"].notna().sum()
    assert p.stats["cat_low_card"]["distinct_count"] == 3
    assert p.stats["bool_col"]["true_count"] == int(pdf["bool_col"].sum())

    ft = p.stats["free_text"]
    lens = pdf["free_text"].str.len()
    assert ft["len_min"] == lens.min() and ft["len_max"] == lens.max()
    assert ft["has_digit_count"] == pdf["free_text"].str.contains(r"\d").sum()


def test_schema_suggestions(spark, wide):
    pdf, df = wide
    p = profile(df, exact_distinct=True)
    s = p.suggestions
    assert s["num_as_string"]["suggested_dtype"] == "double"
    assert s["date_iso"]["suggested_dtype"] == "timestamp"
    assert s["date_iso"]["date_format"] == "yyyy-MM-dd"
    assert s["cat_low_card"]["is_categorical"] is True
    assert s["num_normal"]["is_categorical"] is False
    assert s["int_like_float"]["suggested_dtype"] == "bigint"
    # null bookkeeping matches reference formula (schema_manager.py:43-44)
    assert s["mostly_null"]["null_count"] == pdf["mostly_null"].isna().sum()
    assert math.isclose(
        s["mostly_null"]["null_percentage"],
        100.0 * pdf["mostly_null"].isna().mean(),
        rel_tol=1e-9,
    )


def test_quality_report_shape(spark, wide):
    _pdf, df = wide
    rep = quality_report(df)
    assert 0.0 <= rep["quality_score"] <= 100.0
    assert rep["basic_info"]["rows"] == 2000
    assert rep["duplicates"]["duplicate_count"] == 0
    assert "data_consistency" in rep


def _reference_quality(pdf: pd.DataFrame) -> dict:
    """Pandas re-implementation of the reference's quality pipeline
    (data_analyzer.py:88-89, 144-146, 207-277, 423-455, 457-477) —
    the ground truth the Spark quality_report must reproduce."""
    n = len(pdf)
    missing_pct = pdf.isnull().sum().sum() / pdf.size * 100
    dup_pct = pdf.duplicated().sum() / n * 100
    outlier_rows: set = set()
    for c in pdf.select_dtypes(include=[np.number]).columns:
        s = pdf[c]
        clean = s.dropna()
        if len(clean) == 0:
            continue
        q1, q3 = clean.quantile(0.25), clean.quantile(0.75)
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        iqr_idx = s[(s < lo) | (s > hi)].index.tolist()
        if clean.std() > 0:  # ddof=1, reference data_analyzer.py:262
            z = np.abs((clean - clean.mean()) / clean.std(ddof=0))
            z_idx = clean[z > config.OUTLIER_ZSCORE_THRESHOLD].index.tolist()
            outlier_rows.update(set(iqr_idx) | set(z_idx))
    outlier_pct = len(outlier_rows) / n * 100
    issues = 0
    for c in pdf.select_dtypes(include=["object"]).columns:
        types = set()
        for v in pdf[c].dropna():
            if isinstance(v, str):
                types.add("numeric_string" if v.isdigit() else "text")
        if len(types) > 1:
            issues += 1
    score = 100.0
    score -= min(missing_pct * 0.5, 20)
    score -= min(dup_pct * 0.3, 15)
    score -= min(outlier_pct * 0.2, 10)
    score -= min(issues * 5, 15)
    return {
        "missing_pct": missing_pct, "dup_pct": dup_pct,
        "outlier_pct": outlier_pct, "issues": issues,
        "score": max(score, 0),
    }


def test_quality_score_matches_reference_formula(spark):
    """quality_report(exact=True) must reproduce the reference formula
    term by term on a frame that exercises every deduction."""
    rng = np.random.RandomState(7)
    n = 1200
    pdf = pd.DataFrame(
        {
            "metric": np.concatenate(
                [rng.normal(50, 5, n - 15), rng.normal(50, 5, 15) + 200]
            ),
            "count_n": [None if i % 40 == 0 else float(i % 97) for i in range(n)],
            "mixed_col": [str(i) if i % 9 == 0 else f"val-{i % 5}" for i in range(n)],
            "pure_text": [f"cat-{i % 4}" for i in range(n)],
        }
    )
    # inject exact duplicate rows
    pdf = pd.concat([pdf, pdf.iloc[:30]], ignore_index=True)
    expected = _reference_quality(pdf)
    rep = quality_report(spark.createDataFrame(pdf), exact=True)
    assert math.isclose(
        rep["missing_values"]["missing_percentage"], expected["missing_pct"], rel_tol=1e-9
    )
    assert math.isclose(
        rep["duplicates"]["duplicate_percentage"], expected["dup_pct"], rel_tol=1e-9
    )
    assert math.isclose(
        rep["outliers"]["outlier_percentage"], expected["outlier_pct"], rel_tol=1e-9
    )
    assert len(rep["data_consistency"]["issues"]) == expected["issues"]
    assert math.isclose(rep["quality_score"], expected["score"], rel_tol=1e-9)


def test_profile_invariant_under_repartition(spark, wide):
    _pdf, df = wide
    p1 = profile(df.repartition(2), exact_distinct=True, detect_formats=False)
    p2 = profile(df.repartition(11), exact_distinct=True, detect_formats=False)
    for c in p1.stats:
        for m, v in p1.stats[c].items():
            w = p2.stats[c][m]
            if m in ("q1", "median", "q3"):
                continue  # approx quantiles may differ at partition seams
            if v is None or w is None:
                assert v == w, (c, m)
            else:
                assert math.isclose(v, w, rel_tol=1e-9), (c, m)

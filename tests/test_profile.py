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

"""Normality, categorical inconsistency, chunking, stopword removal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from automatic_data_validator_spark.profile import (
    categorical_inconsistency,
    normality_jarque_bera,
    profile,
)
from automatic_data_validator_spark.textops import chunk_text, remove_stopwords


def test_jarque_bera_from_profile(spark):
    rng = np.random.RandomState(42)
    pdf = pd.DataFrame(
        {"normal": rng.normal(0, 1, 20_000), "skewed": rng.exponential(1, 20_000)}
    )
    p = profile(spark.createDataFrame(pdf))
    assert normality_jarque_bera(p, "normal")["is_normal"] is True
    assert normality_jarque_bera(p, "skewed")["is_normal"] is False


def test_categorical_inconsistency(spark):
    vals = (["New York"] * 50 + ["new york"] * 10 + [" New York "] * 5
            + ["Boston"] * 30)
    df = spark.createDataFrame(pd.DataFrame({"city": vals}))
    rows = categorical_inconsistency(df, "city").collect()
    keys = {r["norm_key"] for r in rows}
    assert keys == {"new york"}  # Boston has one variant -> excluded
    canon = [r["value"] for r in rows if r["is_canonical"]]
    assert canon == ["New York"]  # most frequent variant wins
    assert len(rows) == 3


def test_chunk_text_overlap(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame(pd.DataFrame({"t": [text]}))
    chunks = df.select(chunk_text("t", chunk_words=64, overlap_words=8).alias("c")).collect()[0]["c"]
    assert len(chunks) == 3  # stride 56: covers 150 words in 3 chunks
    assert chunks[0]["n_words"] == 64
    w0 = chunks[0]["text"].split()
    w1 = chunks[1]["text"].split()
    assert w0[56:] == w1[:8]  # overlap region preserved
    # full coverage: last word present in last chunk
    assert "w149" in chunks[-1]["text"].split()


def test_remove_stopwords(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["the cat and THE dog on a mat"]}))
    out = df.select(remove_stopwords("t").alias("r")).collect()[0]["r"]
    assert out == "cat dog mat"


def test_categorical_inconsistency_group_cap_deterministic(spark):
    """max_groups caps GROUPS (largest first, deterministic), never
    splitting a group from its canonical row."""
    import pandas as pd

    from automatic_data_validator_spark.profile import categorical_inconsistency

    rows = []
    for g in range(5):  # group g has 10-2g occurrences -> clear order
        for i in range(10 - 2 * g):
            rows.append(f"City{g}" if i % 2 == 0 else f"city{g}")
    df = spark.createDataFrame(pd.DataFrame({"c": rows}))
    out = categorical_inconsistency(df, "c", max_groups=2).collect()
    keys = {r["norm_key"] for r in out}
    assert keys == {"city0", "city1"}  # the two largest groups
    for k in keys:  # each kept group complete with exactly one canonical
        grp = [r for r in out if r["norm_key"] == k]
        assert len(grp) == 2 and sum(r["is_canonical"] for r in grp) == 1


def test_profile_empty_table_no_phantom_nulls(spark):
    from automatic_data_validator_spark.profile import profile, quality_report

    df = spark.createDataFrame([], "a double, b string")
    p = profile(df, detect_formats=False)
    assert all(s["null_count"] == 0 for s in p.suggestions.values())
    rep = quality_report(df, p=p)
    assert rep["missing_values"]["missing_percentage"] == 0.0
    assert rep["quality_score"] == 100.0


def test_topk_values_quoted_column_names(spark):
    import pandas as pd

    from automatic_data_validator_spark.profile import topk_values

    df = spark.createDataFrame(pd.DataFrame({"it's a col": ["x", "x", "y"]}))
    top = topk_values(df, ["it's a col"], k=1).collect()
    assert top[0]["col_name"] == "it's a col" and top[0]["value"] == "x"


def test_shapiro_wilk_from_scratch():
    """From-scratch Royston AS R94 Shapiro-Wilk (A15 partial->full):
    calibration on normal data, power on exponential, the small-n
    branch, and the original Shapiro & Wilk (1965) worked example
    (11 men's weights, published W = 0.79, non-normal)."""
    import numpy as np

    from automatic_data_validator_spark.profile import shapiro_wilk

    rng = np.random.RandomState(0)
    ps = [shapiro_wilk(rng.normal(0, 1, 100))["p_value"] for _ in range(200)]
    rej = sum(p < 0.05 for p in ps) / 200
    assert 0.005 <= rej <= 0.12, rej  # ~5% nominal size
    assert shapiro_wilk(rng.normal(0, 1, 1000))["W"] > 0.99

    ps2 = [shapiro_wilk(rng.exponential(1.0, 100))["p_value"] for _ in range(50)]
    assert all(p < 0.01 for p in ps2)

    small = shapiro_wilk([1.0, 2.0, 3.0, 4.5, 5.0, 7.0, 8.0])  # n=7 branch
    assert small["W"] is not None and 0.0 <= small["p_value"] <= 1.0

    weights = [148, 154, 158, 160, 161, 162, 166, 170, 182, 195, 236]
    r = shapiro_wilk(weights)
    assert abs(r["W"] - 0.79) < 0.02, r["W"]
    assert r["p_value"] < 0.05 and r["is_normal"] is False

    assert shapiro_wilk([3.0] * 25)["is_normal"] is None  # constant
    assert shapiro_wilk([1.0, 2.0])["W"] is None  # n < 4


def test_shapiro_wilk_column_reference_parity(spark):
    """Column wrapper: deterministic <=5000-value sample, agrees with
    Jarque-Bera's verdict on clearly-normal vs clearly-skewed data."""
    import numpy as np
    import pandas as pd

    from automatic_data_validator_spark.profile import shapiro_wilk_column

    rng = np.random.RandomState(7)
    df = spark.createDataFrame(pd.DataFrame({
        "gauss": rng.normal(50.0, 3.0, 8000),
        "expo": rng.exponential(2.0, 8000),
    }))
    g = shapiro_wilk_column(df, "gauss")
    e = shapiro_wilk_column(df, "expo")
    assert g["n"] == 5000 and e["n"] == 5000  # sampled to the cap
    assert g["is_normal"] is True, g
    assert e["is_normal"] is False and e["p_value"] < 0.001, e
    # deterministic: same seed -> identical result
    assert shapiro_wilk_column(df, "gauss") == g


def test_shapiro_wilk_column_low_cardinality_unbiased_sample(spark):
    """The sample must be uniform over ROWS: hashing the value alone
    sorts all duplicates of a value adjacently, so a 20-distinct-value
    column used to come back as 5000 copies of the 1-2 lowest-hashing
    values. Every distinct value of a uniform 20-value column must
    appear in the 5000-row draw."""
    import pandas as pd

    from automatic_data_validator_spark.profile import shapiro_wilk_column

    df = spark.createDataFrame(pd.DataFrame({
        "rating": [float(i % 20) for i in range(40000)],
    }))
    # reproduce the sample the wrapper draws (same key, same cap)
    sample = [
        r[0]
        for r in df.select(F.col("rating").cast("double"))
        .orderBy(F.xxhash64(F.col("rating"),
                            F.monotonically_increasing_id(), F.lit(42)))
        .limit(5000)
        .collect()
    ]
    assert len(set(sample)) == 20, sorted(set(sample))
    out = shapiro_wilk_column(df, "rating")
    assert out["n"] == 5000 and out["is_normal"] is False

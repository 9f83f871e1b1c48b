"""Expression-allowlist validator (port of the reference AST safety
walk, data_corrector.py:325-367) — pure function, no Spark needed."""

from __future__ import annotations

import pytest

from automatic_data_validator_spark.rules import validate_sql_expr

COLS = ["doc_id", "spans", "n_chars", "text"]


@pytest.mark.parametrize(
    "expr",
    [
        "doc_id is not null",
        "size(spans) > 0 and n_chars between 1 and 100",
        "length(trim(text)) > 3 or text rlike '^[a-z]+$'",
        "coalesce(n_chars, 0) + abs(n_chars) * 2 > 10",
        "exists(spans, x -> x.offset >= 0)",
        "case when n_chars > 5 then true else false end",
        "substring(text, 1, 3) in ('abc', 'def')",
        "to_timestamp(text) is not null",
        "xxhash64(doc_id) != 0",
    ],
)
def test_valid_expressions_accepted(expr):
    validate_sql_expr(expr, COLS)


@pytest.mark.parametrize(
    "expr",
    [
        "java_method('java.lang.Runtime', 'getRuntime') is not null",
        "reflect('java.lang.System', 'exit', 0) = ''",
        "select doc_id from documents",
        "drop table documents",
        "unknown_column > 0",
        "some_udf(doc_id) = 1",
        "shell('rm -rf /') = ''",
        "n_chars > 0; drop table x",
    ],
)
def test_dangerous_or_unknown_rejected(expr):
    with pytest.raises(ValueError):
        validate_sql_expr(expr, COLS)


def test_string_literals_do_not_leak_identifiers():
    # arbitrary words inside literals need no allowlisting...
    validate_sql_expr("text = 'zanzibar quux frobnicate'", COLS)
    # ...but blocked keywords are scanned on the RAW string (before
    # literal stripping), so a literal containing one is rejected
    # conservatively — pin that deliberate fail-closed behavior:
    with pytest.raises(ValueError):
        validate_sql_expr("text = 'drop table'", COLS)
    with pytest.raises(ValueError):
        validate_sql_expr("text = 'java_method x'", COLS)


def test_struct_field_access_validates_head_only():
    validate_sql_expr("exists(spans, x -> x.media_ref is null)", COLS)
    with pytest.raises(ValueError):
        validate_sql_expr("exists(nope, x -> x.media_ref is null)", COLS)


def test_rule_id_with_comma_rejected():
    import pytest as _pytest

    from automatic_data_validator_spark.rules import Rule

    with _pytest.raises(ValueError, match="comma|,"):
        Rule("bad,id", "not_null", column="doc_id")


def test_expr_validator_fuzz_blocked_keywords():
    """Property: any expression containing a blocked keyword (any
    casing, word-boundary) is rejected no matter what surrounds it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from automatic_data_validator_spark.rules import validate_sql_expr

    blocked = ["select", "insert", "drop", "exec", "java_method", "reflect",
               "shell", "system", "truncate"]

    @settings(max_examples=200, deadline=None)
    @given(
        kw=st.sampled_from(blocked),
        prefix=st.text(alphabet="abcz ()+<>=0123456789", max_size=20),
        suffix=st.text(alphabet="abcz ()+<>=0123456789", max_size=20),
        upper=st.booleans(),
    )
    def check(kw, prefix, suffix, upper):
        kw2 = kw.upper() if upper else kw
        expr = f"{prefix} {kw2} {suffix}"
        import pytest as _pytest

        with _pytest.raises(ValueError):
            validate_sql_expr(expr, ["doc_id", "n_chars"])

    check()


def test_expr_validator_fuzz_unknown_identifiers():
    """Property: identifiers outside columns/functions/keywords are
    always rejected; allowlisted ones always pass."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from automatic_data_validator_spark.rules import (
        _ALLOWED_FUNCTIONS,
        _KEYWORDS,
        validate_sql_expr,
    )

    ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,12}", fullmatch=True)

    @settings(max_examples=200, deadline=None)
    @given(name=ident)
    def check(name):
        import pytest as _pytest

        known = (
            name.lower() in _KEYWORDS
            or name.lower() in _ALLOWED_FUNCTIONS
            or name.lower() in ("doc_id", "n_chars")
        )
        blocked_hit = any(
            b in name.lower()
            for b in ("select", "insert", "update", "delete", "drop", "create",
                      "alter", "exec", "shell", "system", "load", "grant",
                      "truncate", "reflect", "java_method", "overwrite")
        )
        if known and not blocked_hit:
            validate_sql_expr(f"{name} = {name}", ["doc_id", "n_chars"])
        elif not known:
            with _pytest.raises(ValueError):
                validate_sql_expr(f"{name} = 1", ["doc_id", "n_chars"])

    check()


def test_numeric_literals_allowed_in_exprs():
    from automatic_data_validator_spark.rules import validate_sql_expr

    validate_sql_expr("score < 1e6 and score > -2.5E-3", ["score"])
    validate_sql_expr("flags = 0x1F", ["flags"])


def test_rule_id_charset_restricted():
    import pytest as _pytest

    from automatic_data_validator_spark.rules import Rule

    for bad in ("a,b", "isn't", "a b", "x`y", ""):
        with _pytest.raises(ValueError):
            Rule(bad, "not_null", column="c")
    Rule("ok-rule_1.2", "not_null", column="c")  # fine


def test_user_partition_id_column_not_shadowed(spark):
    """A data column named partition_id must be evaluated as DATA in
    both the verdict and the violation pass."""
    import pandas as pd

    from automatic_data_validator_spark.rules import Rule, evaluate_row_rules

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c"], "partition_id": [5, 500, 7]})
    )
    from pyspark.sql import functions as F

    v, x = evaluate_row_rules(df, [Rule("pp", "expr", expr="partition_id < 100")])
    assert v.agg(F.sum("violation_count")).collect()[0][0] == 1
    assert [r["doc_id"] for r in x.collect()] == ["b"]

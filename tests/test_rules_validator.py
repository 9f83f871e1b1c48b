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

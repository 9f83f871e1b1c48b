"""Golden byte-match (north_rule: violation rows byte-match the rule
outputs): the canonical JSON-lines serialization of a full validation
run on the seed-42 5k-doc fixture must equal the checked-in artifact
exactly — any engine change that alters rule semantics fails here."""

from __future__ import annotations

import json
import os

from automatic_data_validator_spark.validate import canonical_violations, run_validation

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "violations_5k.jsonl")


def test_violations_byte_match_golden(spark, docs, catalog):
    res = run_validation(spark, docs, catalog=catalog, with_profile=False)
    rows = canonical_violations(res.violations).select(
        "doc_id", "rule_id", "detail"
    ).collect()
    got = "".join(
        json.dumps(
            {"doc_id": r["doc_id"], "rule_id": r["rule_id"], "detail": r["detail"]},
            sort_keys=True,
        )
        + "\n"
        for r in rows
    )
    with open(GOLDEN) as f:
        expected = f.read()
    assert got == expected  # byte-for-byte

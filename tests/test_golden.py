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


def test_minhash_pairs_golden_pin(spark):
    """q32 has no SQL oracle (xxhash64-based LSH); pin its full sf0.01
    row-set instead so silent drift is caught."""
    import json
    import os

    import __spark_entry__ as entrymod

    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "minhash_pairs_sf001.json")
    golden = sorted(tuple(p) for p in json.load(open(golden_path)))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in entrymod.q32_minhash_pairs(spark, "/root/testdata/sf0.01").collect()
    )
    assert got == golden

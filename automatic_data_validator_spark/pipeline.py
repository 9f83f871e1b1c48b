"""Pipeline emission.

Reference: PipelineGenerator (pipeline_generator.py:16-510) asks an
LLM to write a standalone pandas script, lints it, and falls back to a
template. Here the pipeline IS data: the rule set + correction plan
serialize to JSON, and the emitted artifact is a small, readable
spark-submit runner that re-loads them through this package — no
generated logic, nothing to lint, byte-stable output.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from typing import Any

from .correct import CorrectionPlan
from .rules import Rule

RUNNER_TEMPLATE = '''#!/usr/bin/env python
"""Auto-emitted validation/correction pipeline (rule-set driven).

Run: spark-submit --py-files advs.zip {script_name} <input_parquet> <output_dir>
"""

import json
import sys

from pyspark.sql import SparkSession

from automatic_data_validator_spark import rules as R
from automatic_data_validator_spark.correct import CorrectionPlan, apply_plan
from automatic_data_validator_spark.validate import run_validation

RULESET = json.loads({ruleset_literal})
PLAN = json.loads({plan_literal})


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("advs-pipeline").getOrCreate()
    df = spark.read.parquet(inp)
    rules = [R.Rule(**r) for r in RULESET]
    res = run_validation(spark, df, rule_set=rules,
                         checkpoint_dir=out + "/_checkpoints",
                         rule_version="{rule_version}")
    res.verdicts.write.mode("overwrite").parquet(out + "/verdicts")
    res.violations.write.mode("overwrite").parquet(out + "/violations")
    if res.metrics is not None:
        res.metrics.write.mode("overwrite").parquet(out + "/metrics")
    res.lineage.write.mode("overwrite").parquet(out + "/lineage")
    if PLAN is not None:
        PLAN["caps"] = {{k: tuple(v) for k, v in (PLAN.get("caps") or {{}}).items()}}
        plan = CorrectionPlan(**PLAN)
        cleaned = apply_plan(df, plan)
        cleaned.write.mode("overwrite").parquet(out + "/cleaned")
    spark.stop()


if __name__ == "__main__":
    main()
'''


def serialize_rules(rules: list[Rule]) -> str:
    return json.dumps([asdict(r) for r in rules], indent=2, sort_keys=True)


def serialize_plan(plan: CorrectionPlan | None) -> str:
    if plan is None:
        return "null"
    d = asdict(plan)
    d["caps"] = {k: list(v) for k, v in (plan.caps or {}).items()}
    return json.dumps(d, indent=2, sort_keys=True)


def emit_pipeline(
    rules: list[Rule],
    plan: CorrectionPlan | None = None,
    script_name: str = "advs_pipeline.py",
) -> str:
    """Return the runner script text (caller writes it next to the
    --py-files zip). Deterministic: same rules+plan -> same bytes."""
    import hashlib

    ruleset_json = serialize_rules(rules)
    rule_version = "rv-" + hashlib.md5(ruleset_json.encode()).hexdigest()[:12]
    # JSON embedded via repr(): a raw triple-quoted literal would break
    # on any rule string containing ''' (e.g. SQL-escaped quotes)
    return RUNNER_TEMPLATE.format(
        script_name=script_name,
        ruleset_literal=repr(ruleset_json),
        plan_literal=repr(serialize_plan(plan)),
        rule_version=rule_version,
    )


def emit_manifest(rules: list[Rule], plan: CorrectionPlan | None = None) -> dict[str, Any]:
    """Machine-readable pipeline description (reference emits docs +
    requirements alongside the script, pipeline_generator.py:512-694)."""
    return {
        "engine": "automatic_data_validator_spark",
        "rules": [asdict(r) for r in rules],
        "correction_plan": None if plan is None else plan.describe(),
        "run": "spark-submit --py-files advs.zip advs_pipeline.py <in> <out>",
        "outputs": ["verdicts", "violations", "metrics", "lineage", "cleaned"],
    }

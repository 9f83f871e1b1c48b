"""End-to-end validation run: the engine's flagship entry point.

Pipeline (each phase checkpointable, resumable via state.Checkpointer):

  phase "row_rules"    — all row-level rules in one scan -> per-partition
                         verdicts + violation rows (rules.py)
  phase "uniqueness"   — two-phase salted doc_id dedup (dedup.py)
  phase "referential"  — media_ref anti-join vs catalog (refcheck.py)
  phase "profile"      — single-pass column stats -> metrics rows

Outputs: ``verdicts`` / ``violations`` / ``metrics`` / ``lineage``
DataFrames (written as parquet when a checkpoint dir is given). This is
the Spark-native equivalent of the reference's
upload→profile→validate loop (app.py:202-501) with the eager pandas
passes replaced by four lazy plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, profile as prof, refcheck, rules as R
from .state import Checkpointer, lineage_from_verdicts

DEFAULT_RULES: list[R.Rule] = [
    R.Rule("not_null_doc_id", "not_null", column="doc_id"),
    R.Rule("not_null_spans", "expr", expr="spans is not null and size(spans) > 0"),
    R.Rule("span_order", "span_order", column="spans"),
    R.Rule("span_shape", "span_shape", column="spans"),
]


@dataclass
class ValidationResult:
    verdicts: DataFrame
    violations: DataFrame
    metrics: DataFrame | None = None
    lineage: DataFrame | None = None

    def passed(self) -> bool:
        return self.verdicts.filter(~F.col("pass")).limit(1).count() == 0


def run_validation(
    spark: SparkSession,
    documents: DataFrame,
    catalog: DataFrame | None = None,
    rule_set: list[R.Rule] | None = None,
    key_column: str = "doc_id",
    checkpoint_dir: str | None = None,
    snapshot_id: str = "snap-0",
    rule_version: str = "v1",
    with_profile: bool = True,
    check_uniqueness: bool = True,
) -> ValidationResult:
    rule_set = rule_set if rule_set is not None else list(DEFAULT_RULES)
    ckpt = (
        Checkpointer(checkpoint_dir, snapshot_id, rule_version)
        if checkpoint_dir
        else None
    )
    verdict_parts: list[DataFrame] = []
    violation_parts: list[DataFrame] = []
    lineage_parts: list[DataFrame] = []

    def run_phase(name: str, fn) -> tuple[DataFrame, DataFrame]:
        """Run or resume one phase; materialize via checkpoint when on."""
        if ckpt and ckpt.is_done(name):
            return (
                ckpt.read(spark, name, "verdicts"),
                ckpt.read(spark, name, "violations"),
            )
        verdicts, violations = fn()
        if ckpt:
            ckpt.write(name, "verdicts", verdicts)
            ckpt.write(name, "violations", violations)
            verdicts = ckpt.read(spark, name, "verdicts")
            violations = ckpt.read(spark, name, "violations")
            ckpt.mark_done(name)
        return verdicts, violations

    row_rules = R.row_level(rule_set)
    if row_rules:
        v, x = run_phase(
            "row_rules", lambda: R.evaluate_row_rules(documents, row_rules, key_column)
        )
        verdict_parts.append(v)
        violation_parts.append(x)
        lineage_parts.append(
            lineage_from_verdicts(spark, [tuple(r) for r in v.collect()],
                                  "row_rules", snapshot_id, rule_version)
        )

    if check_uniqueness or any(r.kind == "unique_key" for r in rule_set):
        uniq_rules = [r for r in rule_set if r.kind == "unique_key"] or [
            R.Rule("unique_doc_id", "unique_key", column=key_column)
        ]
        for ur in uniq_rules:
            v, x = run_phase(
                f"uniqueness_{ur.rule_id}",
                lambda ur=ur: dedup.uniqueness_check(
                    documents, ur.column or key_column, ur.rule_id
                ),
            )
            verdict_parts.append(v)
            violation_parts.append(x)
            lineage_parts.append(
                lineage_from_verdicts(spark, [tuple(r) for r in v.collect()],
                                      f"uniqueness_{ur.rule_id}", snapshot_id, rule_version)
            )

    if catalog is not None and "spans" in documents.columns:
        v, x = run_phase(
            "referential", lambda: refcheck.referential_check(documents, catalog)
        )
        verdict_parts.append(v)
        violation_parts.append(x)
        lineage_parts.append(
            lineage_from_verdicts(spark, [tuple(r) for r in v.collect()],
                                  "referential", snapshot_id, rule_version)
        )

    metrics = None
    if with_profile:
        p = prof.profile(documents)
        metrics = p.metrics_df(spark)
        if ckpt and not ckpt.is_done("profile"):
            ckpt.write("profile", "metrics", metrics)
            ckpt.mark_done("profile")

    verdicts = verdict_parts[0]
    for v in verdict_parts[1:]:
        verdicts = verdicts.unionByName(v)
    violations = violation_parts[0]
    for x in violation_parts[1:]:
        violations = violations.unionByName(x)
    lineage = lineage_parts[0]
    for l in lineage_parts[1:]:
        lineage = lineage.unionByName(l)
    return ValidationResult(verdicts, violations, metrics, lineage)


def canonical_violations(violations: DataFrame) -> DataFrame:
    """Canonical ordering for byte-match golden tests (SURVEY.md §5.2):
    sorted by (doc_id, rule_id, detail)."""
    return violations.orderBy("doc_id", "rule_id", "detail")

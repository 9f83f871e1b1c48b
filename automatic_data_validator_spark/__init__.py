"""automatic_data_validator_spark — a from-scratch PySpark-native
schema + constraint validation engine.

Re-expresses the *capabilities* of the reference pandas app
(cosmoavijeet07/automatic-data-validator) — schema detection, column
profiling, constraint/quality checks, dedup, correction, pipeline
emission — as lazy, partition-parallel Spark DataFrame plans over
tables of interleaved text+media documents
(``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``).

Design principles (see SURVEY.md §4.2):
  * one fused single-pass aggregation for all column profiles;
  * constraint predicates compile to Spark SQL expressions (no
    per-row Python anywhere; Python hooks are Arrow-vectorized);
  * explicit skew handling (salted two-phase dedup) for hot doc_id
    prefixes;
  * broadcast vs sort-merge referential joins, chosen by size;
  * per-partition verdicts + violation rows + lineage, resumable
    from parquet checkpoints.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .correct import CorrectionPlan, apply_plan, build_plan, clean, summary_report  # noqa: F401
from .pipeline import create_package, emit_pipeline, emit_tests  # noqa: F401
from .profile import (  # noqa: F401
    mixed_type_report,
    profile,
    profile_partitioned,
    quality_report,
)
from .dedup import neardup_dedup  # noqa: F401
from .incremental import (  # noqa: F401
    compact_state,
    rebase_after_compaction,
    validate_incremental,
)
from .rules import Rule, distributed_verdicts, evaluate_row_rules  # noqa: F401
from .sources import write_bucketed_table, write_sorted_table  # noqa: F401
from .state import (  # noqa: F401
    Checkpointer,
    CheckpointRegistry,
    export_summary,
    run_summary,
)
from .textops import text_change_report  # noqa: F401
from .validate import ValidationResult, canonical_violations, run_validation  # noqa: F401

"""Schema change application & validation.

Reference: SchemaManager.apply_schema_changes (schema_manager.py:183-237)
does eager per-column pandas casts with errors='coerce' and print-skip
on failure; validate_schema_changes (239-272) trial-casts.

Here a cast plan — list of (column, target_type, optional datetime
format) — compiles to ONE narrow `select` projection (no shuffle, one
pass), with `try_cast`/`try_to_timestamp` reproducing errors='coerce'
null-on-failure semantics. Validation is a fused aggregation counting
nulls-created per cast, again one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_BOOL_TRUE = ["true", "1", "yes", "y", "t"]
_BOOL_FALSE = ["false", "0", "no", "n", "f"]


@dataclass
class CastSpec:
    column: str
    target: str                 # spark type name: bigint/double/timestamp/boolean/string/date
    fmt: str | None = None      # datetime pattern for timestamp/date targets


def _cast_expr(spec: CastSpec):
    c = F.col(spec.column)
    t = spec.target.lower()
    if t in ("timestamp", "date"):
        if spec.fmt:
            e = F.try_to_timestamp(c.cast("string"), F.lit(spec.fmt))
        else:
            e = F.try_to_timestamp(c.cast("string"))
        return (e.cast("date") if t == "date" else e).alias(spec.column)
    if t == "boolean":
        # pandas truthiness table (reference schema_manager.py:225-227)
        lc = F.lower(F.trim(c.cast("string")))
        return (
            F.when(lc.isin(_BOOL_TRUE), F.lit(True))
            .when(lc.isin(_BOOL_FALSE), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
            .alias(spec.column)
        )
    return c.try_cast(t).alias(spec.column)


def apply_cast_plan(df: DataFrame, plan: list[CastSpec]) -> DataFrame:
    """All casts in one projection — single narrow stage."""
    by_col = {s.column: s for s in plan}
    return df.select(
        *[
            _cast_expr(by_col[c]) if c in by_col else F.col(c)
            for c in df.columns
        ]
    )


def validate_cast_plan(df: DataFrame, plan: list[CastSpec]) -> dict[str, dict]:
    """Trial-cast validation in one fused agg: for each cast, how many
    non-null values would become null (reference schema_manager.py:239-272
    runs one trial per column)."""
    exprs = []
    for s in plan:
        src_nn = F.count(F.col(s.column))
        casted = _cast_expr(s)
        # strip alias for counting
        cast_nn = F.count(casted)
        exprs.append(src_nn.alias(f"src_{s.column}"))
        exprs.append(cast_nn.alias(f"dst_{s.column}"))
    row = df.agg(*exprs).collect()[0].asDict()
    out = {}
    for s in plan:
        src, dst = row[f"src_{s.column}"], row[f"dst_{s.column}"]
        out[s.column] = {
            "target": s.target,
            "non_null_before": src,
            "non_null_after": dst,
            "nulls_created": src - dst,
            "ok": (src - dst) == 0,
            "convert_ratio": (dst / src) if src else 1.0,
        }
    return out


def suggest_cast_plan(profile_suggestions: dict[str, dict]) -> list[CastSpec]:
    """Build a cast plan from profile.ProfileResult.suggestions."""
    plan: list[CastSpec] = []
    for col, s in profile_suggestions.items():
        tgt = s.get("suggested_dtype")
        if tgt and tgt != s.get("dtype"):
            plan.append(CastSpec(col, tgt, s.get("date_format")))
    return plan

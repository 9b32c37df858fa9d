"""Physical-plan hygiene helpers.

Used by tests (and humans) to assert the plans we *intend* are the plans
Catalyst actually picks: filters pushed into the parquet/Iceberg scan,
column pruning active, whole-stage codegen covering the relational glue,
broadcast joins where a side is small.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the data source scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider is better for JVM glue)."""
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan — each is one shuffle boundary."""
    return len(re.findall(r"\bExchange\b", formatted_plan(df)))


def plan_report(df: DataFrame) -> dict:
    return {
        "pushed_filters": pushed_filters(df),
        "read_columns": read_schema_columns(df),
        "codegen_stages": codegen_stage_count(df),
        "broadcast_join": uses_broadcast_join(df),
        "shuffles": shuffle_count(df),
    }

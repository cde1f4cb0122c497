"""Physical-plan inspection helpers — scale hygiene made assertable.

The 100 TB discipline ("filters push into the scan", "small sides broadcast",
"expressions stay in whole-stage codegen") is enforced by tests that parse
``explain("formatted")`` output with these helpers, so a regression that
silently de-optimizes a plan fails CI instead of surfacing as a slow cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema strings for each scan (column pruning evidence)."""
    return re.findall(r"ReadSchema: (\S+)", explain_str(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer Python/interpreted
    boundaries)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))

"""Physical-plan introspection: make scale discipline *testable*.

`.explain()` prints; these helpers return the plan text so tests can
assert the properties that matter at 100 TB — filters reached the
parquet scan, projections pruned columns, dimension joins broadcast,
rank-limit windows got the WindowGroupLimit rewrite, codegen covers the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(explain_mode)


def executed_plan_str(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — run an action first for AQE
    re-optimized plans; for static checks the formatted plan suffices."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = explain_str(df)
    return any(fragment in line for line in plan.splitlines() if "PushedFilters" in line)


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually requested from the parquet reader (union over all
    scans in the plan)."""
    import re

    cols: set[str] = set()
    for line in explain_str(df).splitlines():
        if "ReadSchema" in line:
            for m in re.finditer(r"(\w+):", line.split("ReadSchema", 1)[1]):
                cols.add(m.group(1))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    plan = explain_str(df)
    out = []
    for marker in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin"):
        if marker in plan:
            out.append(marker)
    return out


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. Uses codegen explain mode:
    under AQE the formatted plan hides codegen stage markers until
    execution, but codegen mode compiles the current physical plan."""
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0

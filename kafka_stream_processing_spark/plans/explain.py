"""Plan introspection — the engine's analog of the reference's
``topology.describe()`` (UniqueUsersCounter.java:96), plus machine-checkable
assertions about the physical properties that matter at 100 TB.

Where the reference prints a fixed 8-node processor DAG, Spark exposes four
compiler stages (parsed → analyzed → optimized → physical); the helpers
here capture the formatted physical plan and assert the scale-critical
facts: filters reached the scan, projections pruned columns, small sides
broadcast, codegen fused the pipeline.  tests/test_plans.py pins these for
the headline queries so a regression that silently de-optimizes a plan
(e.g. a cast blocking pushdown) fails CI, not a production run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain()` as a string (Spark only offers printing)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    text: str

    def has(self, fragment: str) -> bool:
        return fragment in self.text

    @property
    def pushed_filters(self) -> bool:
        return "PushedFilters: [" in self.text and not self.has("PushedFilters: []")

    @property
    def broadcast_join(self) -> bool:
        return "BroadcastHashJoin" in self.text or "BroadcastNestedLoopJoin" in self.text

    @property
    def whole_stage_codegen(self) -> bool:
        # formatted mode marks fused operators with "[codegen id : N]".
        return "[codegen id :" in self.text or "WholeStageCodegen" in self.text

    @property
    def n_exchanges(self) -> int:
        import re

        return sum(
            1
            for line in self.text.splitlines()
            if re.match(r"^\(\d+\) Exchange", line.strip())
        )

    def read_schema_columns(self) -> list[str]:
        """TOP-LEVEL column list of the first scan's ReadSchema line
        (pruning check).  Depth-aware parse: nested struct/array/map types
        contain commas and colons that a naive split would miscount."""
        for line in self.text.splitlines():
            line = line.strip()
            if not line.startswith("ReadSchema:"):
                continue
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols: list[str] = []
            depth = 0
            field_start = 0
            for i, ch in enumerate(inner + ","):
                if ch in "<([":
                    depth += 1
                elif ch in ">)]":
                    depth -= 1
                elif ch == "," and depth == 0:
                    field = inner[field_start:i]
                    if field:
                        cols.append(field.split(":", 1)[0].strip())
                    field_start = i + 1
            return cols
        return []


def plan_report(df: DataFrame) -> PlanReport:
    return PlanReport(explain_str(df, "formatted"))


def plan_asserts(df: DataFrame, *, pushed: bool | None = None,
                 broadcast: bool | None = None,
                 codegen: bool | None = None,
                 max_scan_columns: int | None = None) -> PlanReport:
    """Assert physical-plan properties; returns the report for further
    inspection.  Used by tests; also handy interactively."""
    rep = plan_report(df)
    if pushed is not None:
        assert rep.pushed_filters == pushed, (
            f"pushdown expected={pushed}:\n{rep.text[:4000]}"
        )
    if broadcast is not None:
        assert rep.broadcast_join == broadcast, (
            f"broadcast expected={broadcast}:\n{rep.text[:4000]}"
        )
    if codegen is not None:
        assert rep.whole_stage_codegen == codegen, (
            f"codegen expected={codegen}:\n{rep.text[:4000]}"
        )
    if max_scan_columns is not None:
        cols = rep.read_schema_columns()
        assert cols and len(cols) <= max_scan_columns, (
            f"scan reads {len(cols)} columns {cols}, expected <= {max_scan_columns}"
        )
    return rep

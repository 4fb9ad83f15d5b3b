"""Physical-plan inspection helpers.

Scale discipline is enforceable: these helpers read the formatted plan
so tests can assert that filters reached the scan (PushedFilters), scans
prune columns (ReadSchema), dim joins broadcast, and no Python UDF node
(`BatchEvalPython`/`ArrowEvalPython`) sneaks into a hot path. The
reference could not make these guarantees — its Python UDFs blocked
pushdown everywhere (SURVEY §4 O-GAP1/2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a scan's PushedFilters mentions ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names appearing in scan ReadSchema entries (pruning check)."""
    import re

    cols: set[str] = set()
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            # parse field names inside struct<...> only — the bare
            # r"(\w+):" would also swallow the "ReadSchema:" label
            m = re.search(r"struct<(.*)>", line)
            if m:
                cols.update(re.findall(r"(\w+):", m.group(1)))
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Names of Python-evaluation operators in the plan (should be [] for
    native pipelines; non-empty only for deliberate pandas-UDF stages)."""
    return python_eval_nodes_text(formatted_plan(df))


def python_eval_nodes_text(plan: str) -> list[str]:
    """:func:`python_eval_nodes` over an already-formatted plan string —
    lets the registry-wide test sweeps share ONE plan capture per query
    (r15)."""
    return [
        node
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        if node in plan
    ]


def single_partition_exchanges(df: DataFrame) -> int:
    """Number of ``Exchange SinglePartition`` nodes — each one funnels
    its whole input through ONE task (global windows/sorts/limits). Any
    occurrence on an unbounded input is a scale bug; bounded inputs
    (per-shard summaries, final top-k of a small set) may keep one."""
    import re

    # formatted mode prints node headers bare ("(5) Exchange") with the
    # partitioning in a per-node "Arguments:" detail line
    return len(
        re.findall(
            r"^Arguments: SinglePartition",
            formatted_plan(df),
            re.MULTILINE,
        )
    )


def executed_shuffle_stages(
    df: DataFrame, materialize: bool = True
) -> tuple[int, int]:
    """(real, reused) shuffle stages in the EXECUTED (post-AQE) plan.

    The static plan repeats a repartition subtree under every consumer
    branch, so :func:`shuffle_count` over-counts what actually runs;
    after execution, AQE's exchange reuse turns the duplicates into
    ``ReusedExchange`` children of their query stages. ``real`` counts
    shuffle stages that materialized their own map output — the
    scale-governing quantity at runtime; ``reused`` counts the
    stages that read another stage's output instead (each one is a
    static-plan duplicate that cost nothing extra). Collects the frame
    (unless ``materialize=False`` and the caller already has)."""
    import re

    if materialize:
        df.collect()
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()  # type: ignore[attr-defined]
    real = reused = 0
    seen: set[str] = set()
    for i, line in enumerate(lines):
        m = re.search(r"ShuffleQueryStage (\d+)", line)
        if not m or m.group(1) in seen:
            continue
        seen.add(m.group(1))
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        if "ReusedExchange" in nxt:
            reused += 1
        else:
            real += 1
    return real, reused


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale-governing quantity."""
    return shuffle_count_text(formatted_plan(df))


def shuffle_count_text(plan: str) -> int:
    """:func:`shuffle_count` over an already-formatted plan string (r15:
    shared one-capture sweeps, like :func:`python_eval_nodes_text`)."""
    import re

    # count node-detail headers like "(5) Exchange" so each operator
    # counts once (the formatted output also repeats names in the tree)
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))

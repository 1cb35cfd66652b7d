"""EXPLAIN / ANALYZE surface (reference SURVEY §2.9).

- ``explain_plan``: the physical plan as text (reference builds a PlanNode
  tree with io/cpu/mem costs — explain.rs:71-600; Spark's formatted plan is
  the same artifact, with real codegen/exchange/pushdown info).
- ``plan_facts``: machine-checkable assertions about a plan (did the filter
  push down? did the join broadcast?) — used by tests to pin the physical
  shapes this engine promises at scale.
- ``analyze_table``: per-column statistics (row count, distinct, nulls,
  min/max) like the reference's ANALYZE (engine.rs:1422+, optimizer
  histograms optimizer.rs:548-780). Emitted as data, and usable to feed
  Spark CBO via ANALYZE TABLE when tables live in a real catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explain_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_facts(df: DataFrame) -> dict[str, bool]:
    """Inspect the physical plan for the properties we design for."""
    plan = explain_plan(df, "formatted")
    return {
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "whole_stage_codegen": "WholeStageCodegen" in plan or "[codegen id :" in plan,
        "has_exchange": "Exchange" in plan,
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def analyze_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats as one row per column: (column, n_rows, n_distinct,
    n_nulls, min_str, max_str). One pass over the table — every stat is an
    aggregate, so partial aggregation keeps the shuffle at |columns| rows."""
    cols = columns or df.columns
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.approx_count_distinct(c).alias(f"_ad_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    data = [
        (c, row["_n"], row[f"_ad_{c}"], row[f"_nn_{c}"], row[f"_min_{c}"], row[f"_max_{c}"])
        for c in cols
    ]
    return spark.createDataFrame(
        data,
        "column string, n_rows long, approx_distinct long, n_nulls long, min_str string, max_str string",
    )


def explain_analyze(df: DataFrame) -> list[dict]:
    """EXPLAIN ANALYZE (reference sql_bridge.rs:580-670 + explain.rs —
    measured rows/time per plan node): execute the query, then walk the
    final physical plan collecting each operator's runtime metrics
    (rows output, time spent, spill, shuffle bytes — whatever the node
    recorded).

    Returns one dict per operator: {node, depth, metrics:{name: value}}.
    The walk unwraps AQE (AdaptiveSparkPlanExec → final plan) and
    whole-stage-codegen wrappers, and descends into reused exchanges and
    shuffle/broadcast query stages so the tree matches what actually ran.
    """
    # Execute THIS plan instance (a .count() or .write would build a
    # different QueryExecution and leave these metrics empty): drive the
    # physical plan's row RDD to completion without collecting rows.
    root = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    root.execute().count()

    out: list[dict] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth)
            return
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[str(kv._1())] = int(kv._2().value())
        out.append({"node": str(name), "depth": depth, "metrics": metrics})
        # query stages (result/shuffle/broadcast) wrap their subtree in .plan()
        cls = node.getClass().getSimpleName()
        if cls.endswith("QueryStageExec"):
            walk(node.plan(), depth + 1)
            return
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), depth + 1)

    walk(root, 0)
    return out

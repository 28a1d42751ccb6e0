"""Physical-plan inspection: structured answers to "did the optimizer
do the thing that keeps this query viable at 100 TB?"."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """The physical plan string. With finalize=True the query is
    executed first so AQE's final (runtime-adapted) plan is returned.
    NB: must execute the DataFrame's OWN QueryExecution — a
    write.save() wraps the plan in a NEW QueryExecution and the
    DataFrame's own plan never finalizes. The drain rides
    toLocalIterator (one partition of driver memory at a time), not
    collect(): a full-result collect of every headline query at the
    bench SF materialized whole corpora driver-side just to read a
    plan string (round-7 review finding).
    Plan metadata truncation is lifted so PushedFilters parse fully."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        if finalize:
            for _ in df.toLocalIterator():
                pass
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffle_hash_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    codegen_stages: int = 0
    has_partial_agg: bool = False
    has_take_ordered: bool = False
    has_window_group_limit: bool = False

    def summary(self) -> str:
        return (
            f"joins: {self.broadcast_joins} broadcast / {self.sort_merge_joins} SMJ / "
            f"{self.shuffle_hash_joins} SHJ / {self.cartesian_products} cartesian; "
            f"{self.exchanges} exchanges; {self.codegen_stages} codegen stages; "
            f"partial-agg={self.has_partial_agg}; "
            f"pushed={self.pushed_filters}; partition={self.partition_filters}"
        )


# Bounded bracket capture for FileScan filter sections: lazy up to a
# ']' that is followed by the next "Key: " section or end-of-line.
# Survives BOTH failure modes seen in review: nested ']' inside
# In(col, [v1,v2]) (a lazy [^\]]* truncated there, dropping any filters
# after it — round-7 finding) AND a later bracketed segment on the same
# line such as DSv2 "RuntimeFilters: [...]" (a greedy (.*)\] swallowed
# it into pushed_filters — round-8 ADVICE finding). "], IsNotNull(..."
# after a nested list does not terminate the capture because filter
# names are followed by '(' not ': '.
FILTER_SECTION_RE = r"\[(.*?)\](?=, [A-Z]\w+: |$)"


def plan_report(df: DataFrame, finalize: bool = False) -> PlanReport:
    plan = executed_plan(df, finalize=finalize)
    # a finalized AdaptiveSparkPlan prints Final AND Initial sections —
    # count only the plan that actually ran
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    r = PlanReport()
    r.pushed_filters = [
        m
        for m in re.findall(r"PushedFilters: " + FILTER_SECTION_RE, plan, re.M)
        if m.strip()
    ]
    r.partition_filters = [
        m
        for m in re.findall(r"PartitionFilters: " + FILTER_SECTION_RE, plan, re.M)
        if m.strip()
    ]
    r.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    r.broadcast_joins = plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    r.sort_merge_joins = plan.count("SortMergeJoin")
    r.shuffle_hash_joins = plan.count("ShuffledHashJoin")
    r.cartesian_products = plan.count("CartesianProduct")
    r.exchanges = plan.count("Exchange ")
    r.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", plan)))
    r.has_partial_agg = "partial_" in plan
    r.has_take_ordered = "TakeOrderedAndProject" in plan
    r.has_window_group_limit = "WindowGroupLimit" in plan
    return r

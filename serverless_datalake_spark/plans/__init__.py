"""Plan introspection utilities (SURVEY.md §4).

The reference has no optimizer — its \"plans\" are frozen architecture
(partition keys, buffer sizes). Here the optimizer is Catalyst; these
helpers expose what it decided so tests and humans can verify the
scale-critical properties: pushdown, pruning, join strategy, codegen.
"""

from serverless_datalake_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    plan_report,
)

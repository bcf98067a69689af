"""Physical-plan introspection and scale-guardrail checks."""

from python_cdc_spark.plans.checks import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    plan_report,
    pushed_filters,
    scanned_columns,
)
